"""Sequence packing — assemble documents/chunks into fixed-token-budget
training sequences (the step between chunking and batching in an LLM
data pipeline; reference's span-assembly contract reinterpreted for
token windows, cf. zparse `converter/mod.rs` join semantics).

Two standard flavors, both per-batch maps (zero shuffle):

- ``mode="split"`` — GPT-style concat-and-slice: the batch's documents
  are joined with a single-space separator into one token stream and
  cut every ``seq_tokens`` tokens. ZERO padding by construction;
  documents may straddle a cut (each carries its member doc_ids).
  Fully vectorized: one join (C-level ``binary_join``), one
  token-edge mask pass over the combined UTF-8 buffer, one ragged
  gather (the ``stages/chunk.py`` machinery on a 1-row table).
- ``mode="whole"`` — documents stay intact (SFT-style sample packing):
  next-fit over the batch's rows in input order — each sequence is a
  CONTIGUOUS run of input rows, so provenance is a range and input
  locality (e.g. overlap continuity from chunking, curriculum order
  from ``deterministic_shuffle``) is preserved. Since every row is
  <= ``seq_tokens`` (enforced loudly — pre-chunk oversize docs), the
  next-fit guarantee is PAIRWISE: any two CONSECUTIVE sequences in a
  batch together exceed ``seq_tokens`` (the first doc of sequence
  k+1 did not fit into sequence k), i.e. >= 50% average utilization —
  an individual sequence CAN be under half full (e.g. docs of 20 then
  50 tokens at budget 64). Padding is reported per sequence as
  ``pad_tokens`` (never silent). The only Python loop is over
  BINS (one ``searchsorted`` each), i.e. ``seq_tokens/avg_row_tokens``
  times fewer iterations than rows — bin-level, not row-level,
  dispatch.

Packing is deterministic GIVEN a block layout (each batch packs
independently; boundary waste is at most one short sequence per
batch). For a layout-independent result, feed one input shard per
block (``pack_corpus`` reads per-file) — the resumable-output
partitioning the brief requires anyway.

Token definition matches ``stages/chunk.py`` exactly (counts come from
the same byte-level edge pass): maximal runs of non-``[\\t\\n\\f\\r ]``
bytes — so the single-space joiner adds zero tokens and packed token
counts are EXACTLY the sum of member counts (tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .chunk import chunk_documents_batch

_EMPTY = {
    "seq_in_batch": pa.array([], pa.int64()),
    "text": pa.array([], pa.string()),
    "n_tokens": pa.array([], pa.int64()),
    "pad_tokens": pa.array([], pa.int64()),
    "n_docs": pa.array([], pa.int64()),
    "doc_ids": pa.array([], pa.list_(pa.int64())),
}


def _doc_id_lists(ids: np.ndarray, firsts: np.ndarray, lasts: np.ndarray) -> pa.Array:
    """list<int64> array: row k = ids[firsts[k] .. lasts[k]] inclusive."""
    lengths = (lasts - firsts + 1).astype(np.int64)
    off = np.zeros(len(lengths) + 1, np.int64)
    np.cumsum(lengths, out=off[1:])
    base = np.repeat(firsts - off[:-1], lengths)
    flat = ids[np.arange(off[-1], dtype=np.int64) + base]
    return pa.LargeListArray.from_arrays(
        pa.array(off, pa.int64()), pa.array(flat, pa.int64())
    ).cast(pa.list_(pa.int64()))


def _token_counts(texts: pa.Array) -> np.ndarray:
    """Per-row token counts with chunk.py's OWN byte-level edge pass, so
    pack counts agree with the split-mode cutter by construction (the
    pandas ``\\S+`` counter in textops treats unicode whitespace as a
    separator; the chunk machinery deliberately does not)."""
    from .chunk import _flat_utf8, _token_edges

    buf, off = _flat_utf8(pa.chunked_array([texts]))
    tok_starts, _ = _token_edges(buf, off)
    first = np.searchsorted(tok_starts, off)
    return np.diff(first).astype(np.int64)


def pack_batch(
    batch: pa.Table,
    *,
    seq_tokens: int = 4096,
    mode: str = "split",
    column: str = "text",
    id_column: str = "doc_id",
) -> pa.Table:
    """Pack one batch into (seq_in_batch, text, n_tokens, pad_tokens,
    n_docs, doc_ids) rows. See module docstring for the two modes."""
    if seq_tokens <= 0:
        raise ValueError(f"seq_tokens must be positive, got {seq_tokens}")
    if mode not in ("split", "whole"):
        raise ValueError(f"mode must be 'split' or 'whole', got {mode!r}")
    col = pc.fill_null(batch[column].combine_chunks() if isinstance(batch[column], pa.ChunkedArray) else batch[column], "")
    tok = _token_counts(col)
    keep = tok > 0  # empty/ws-only rows carry no tokens: drop up front
    ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
    col = col.filter(pa.array(keep))
    tok = tok[keep]
    n = len(tok)
    if n == 0:
        return pa.table(_EMPTY)

    if mode == "whole":
        over = tok > seq_tokens
        if over.any():
            bad = ids[over][:3].tolist()
            raise ValueError(
                f"{int(over.sum())} rows exceed seq_tokens={seq_tokens} "
                f"(e.g. {id_column}s {bad}); chunk them first "
                "(stages/chunk.py) or use mode='split'"
            )
        csum = np.zeros(n + 1, np.int64)
        np.cumsum(tok, out=csum[1:])
        bounds = [0]
        i = 0
        while i < n:  # bin-level loop: one searchsorted per sequence
            j = int(np.searchsorted(csum, csum[i] + seq_tokens, side="right")) - 1
            bounds.append(j)
            i = j
        b = np.asarray(bounds, np.int64)
        firsts, lasts = b[:-1], b[1:] - 1
        # member texts joined with ' ' (a token-free separator)
        lengths = (lasts - firsts + 1).astype(np.int64)
        loff = np.zeros(len(lengths) + 1, np.int64)
        np.cumsum(lengths, out=loff[1:])
        lists = pa.LargeListArray.from_arrays(
            pa.array(loff, pa.int64()), pc.cast(col, pa.large_string())
        )
        text = pc.cast(
            pc.binary_join(lists, pa.scalar(" ", pa.large_string())), pa.string()
        )
        n_tok = csum[b[1:]] - csum[b[:-1]]
        return pa.table(
            {
                "seq_in_batch": pa.array(np.arange(len(firsts)), pa.int64()),
                "text": text,
                "n_tokens": pa.array(n_tok, pa.int64()),
                "pad_tokens": pa.array(seq_tokens - n_tok, pa.int64()),
                "n_docs": pa.array(lengths, pa.int64()),
                "doc_ids": _doc_id_lists(ids, firsts, lasts),
            }
        )

    # mode == "split": one joined stream, cut every seq_tokens tokens
    joined = pc.binary_join(
        pa.LargeListArray.from_arrays(
            pa.array([0, n], pa.int64()), pc.cast(col, pa.large_string())
        ),
        pa.scalar(" ", pa.large_string()),
    )
    one = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pc.cast(joined, pa.string())})
    seqs = chunk_documents_batch(one, chunk_tokens=seq_tokens, overlap_tokens=0)
    n_seqs = seqs.num_rows
    if n_seqs == 0:
        return pa.table(_EMPTY)
    # provenance: sequence k covers global tokens [k*S, k*S + n_tokens_k);
    # doc d owns global tokens [tcum[d], tcum[d+1])
    tcum = np.zeros(n + 1, np.int64)
    np.cumsum(tok, out=tcum[1:])
    s_tok = seqs["n_tokens"].to_numpy().astype(np.int64)
    s0 = np.arange(n_seqs, dtype=np.int64) * seq_tokens
    firsts = np.searchsorted(tcum, s0, side="right") - 1
    lasts = np.searchsorted(tcum, s0 + s_tok - 1, side="right") - 1
    return pa.table(
        {
            "seq_in_batch": pa.array(np.arange(n_seqs), pa.int64()),
            "text": seqs["text"],
            "n_tokens": seqs["n_tokens"],
            "pad_tokens": pa.array(seq_tokens - s_tok, pa.int64()),
            "n_docs": pa.array(lasts - firsts + 1, pa.int64()),
            "doc_ids": _doc_id_lists(ids, firsts, lasts),
        }
    )


def pack_sequences(
    ds,
    *,
    seq_tokens: int = 4096,
    mode: str = "split",
    column: str = "text",
    id_column: str = "doc_id",
):
    """Dataset wrapper: per-BLOCK packing (``batch_size=None`` — each
    block packs whole, so boundary waste is one short sequence per
    block, and per-shard inputs give layout-independent output)."""
    return ds.map_batches(
        pack_batch,
        fn_kwargs={
            "seq_tokens": seq_tokens,
            "mode": mode,
            "column": column,
            "id_column": id_column,
        },
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
