"""Cross-document repeated-passage mining — find pairs of documents
sharing long EXACT substrings (quotations, mirrored passages, licence
blocks, templated boilerplate) that token-level MinHash under-weighs
and whole-doc hashing misses entirely.

Algorithm: MOSS-style winnowing (Schleimer/Wilkerson/Aiken, public):
per document, hash every ``window``-byte substring (the repo's shared
rolling-hash prefix-sum pass), then keep the minimum of every
``guarantee`` consecutive window hashes — the winnowed fingerprint
set. The winnowing guarantee: two documents sharing an exact substring
of at least ``window + guarantee - 1`` bytes share at least one
fingerprint (tested as a property).

Ray-Data-first shapes:

- fingerprinting is a pure per-batch map — one UTF-8 buffer concat,
  one dense window-hash pass, one C-level sliding-window min; winnow
  windows are only kept where they lie entirely inside one document's
  valid range, so no cross-document leakage (the ``fingerprint_batch``
  masking rationale). Only (doc_id, fp) pairs leave the stage — the
  text never shuffles;
- candidate pairs come from ONE ``groupby(fp)`` with the LSH bucket
  discipline (cap + NON-SILENT truncation markers, the
  ``lsh_candidate_pairs`` contract);
- a second ``groupby(a, b).sum`` counts shared fingerprints per pair
  and applies ``min_shared`` — both shuffles move O(fingerprints)
  compact integer rows, bounded by bytes/guarantee per document.

Short-document semantics: a document with fewer than ``guarantee``
valid window positions contributes the min over what it has; one
shorter than ``window`` bytes contributes its full-text hash —
mirrored exactly by the per-row reference implementation the batch
path is equivalence-tested against.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.sketches import hash64
from .textops import _dense_window_hashes
from .textops import arrow_text_series

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def winnow_reference(text: str, *, window: int = 32,
                     guarantee: int = 64) -> set[int]:
    """Per-row reference winnowing (the slow obvious implementation
    the batch path is tested against). Returns the fingerprint set as
    uint64 ints."""
    buf = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(buf) == 0:
        return set()
    if len(buf) < window:
        return {int(hash64(np.array([text], dtype=object))[0])}
    h = _dense_window_hashes(buf, window)
    if len(h) < guarantee:
        return {int(h.min())}
    mins = {int(h[i:i + guarantee].min()) for i in range(len(h) - guarantee + 1)}
    return mins


def passage_fingerprint_batch(batch: pa.Table, *, column: str = "text",
                              id_column: str = "doc_id", window: int = 32,
                              guarantee: int = 64) -> pa.Table:
    """(doc_id, fp) rows: each document's winnowed fingerprint set
    (deduplicated). Fully vectorized across the batch."""
    import pyarrow.compute as pc

    s = arrow_text_series(batch[column])
    ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    blen = pc.binary_length(
        pc.cast(pc.fill_null(batch[column].combine_chunks(), ""), pa.binary())
    ).to_numpy().astype(np.int64)
    out_doc: list[np.ndarray] = []
    out_fp: list[np.ndarray] = []

    # tiny docs (< window bytes, non-empty): full-text hash
    tiny = (blen > 0) & (blen < window)
    if tiny.any():
        out_doc.append(ids[tiny])
        out_fp.append(hash64(s.to_numpy(dtype=object)[tiny]))

    long_rows = blen >= window
    if long_rows.any():
        texts = s[long_rows]
        lids = ids[long_rows]
        lblen = blen[long_rows]
        buf = np.frombuffer("".join(texts.tolist()).encode("utf-8"),
                            dtype=np.uint8)
        offsets = np.zeros(len(lids) + 1, np.int64)
        np.cumsum(lblen, out=offsets[1:])
        H = _dense_window_hashes(buf, window)
        n_pos = len(H)
        # valid window-hash positions for doc d: [offsets[d],
        # offsets[d+1] - window]; n_valid = lblen[d] - window + 1 >= 1
        n_valid = lblen - window + 1
        # docs with >= guarantee valid positions: global sliding min,
        # keeping only winnow-window starts fully inside the doc
        has_full = n_valid >= guarantee
        if has_full.any() and n_pos >= guarantee:
            SW = np.lib.stride_tricks.sliding_window_view(
                H, guarantee).min(axis=1)
            n_win = np.where(has_full, n_valid - guarantee + 1, 0)
            rows_of = np.repeat(np.arange(len(lids)), n_win)
            within = (np.arange(int(n_win.sum()))
                      - np.repeat(np.cumsum(n_win) - n_win, n_win))
            pos = offsets[rows_of] + within
            d, f = rows_of, SW[pos]
            # dedupe (doc, fp) pairs
            order = np.lexsort((f, d))
            d, f = d[order], f[order]
            keep = np.ones(len(d), bool)
            keep[1:] = (d[1:] != d[:-1]) | (f[1:] != f[:-1])
            out_doc.append(lids[d[keep]])
            out_fp.append(f[keep])
        # short docs (1 <= n_valid < guarantee): one min over exactly
        # the doc's valid range [offsets[d], offsets[d] + n_valid) via
        # interleaved-bounds reduceat (even segments are the doc
        # ranges, odd segments the gaps — discarded); the appended
        # sentinel makes end == len(H) a legal index
        short = ~has_full
        if short.any():
            srows = np.flatnonzero(short)
            bounds = np.empty(2 * len(srows), np.int64)
            bounds[0::2] = offsets[srows]
            bounds[1::2] = offsets[srows] + n_valid[srows]
            seg_mins = np.minimum.reduceat(np.append(H, _U64_MAX), bounds)[0::2]
            out_doc.append(lids[srows])
            out_fp.append(seg_mins)

    if not out_doc:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "fp": pa.array([], pa.int64())})
    return pa.table({
        "doc_id": pa.array(np.concatenate(out_doc).astype(np.int64),
                           pa.int64()),
        "fp": pa.array(np.concatenate(out_fp).view(np.int64), pa.int64()),
    })


_EMPTY_PAIRS = {"a": np.zeros(0, np.int64), "b": np.zeros(0, np.int64),
                "one": np.zeros(0, np.int64),
                "n_dropped": np.zeros(0, np.int64)}


def _bucket_pairs(group: pd.DataFrame, cap: int) -> pd.DataFrame:
    """Pair emission for ONE HASH BUCKET of fingerprints (many fps per
    call — a per-fp ``map_groups`` paid ~1 ms of Python per group,
    which dominated wall time; this body is one Python call per
    bucket, all C-level inside): dedupe (fp, doc), cap each fp at
    ``cap`` docs with a NON-SILENT truncation marker per hot fp (the
    ``lsh_candidate_pairs`` discipline), then emit every same-fp doc
    pair via a pandas self-merge (C hash join) filtered to a < b."""
    df = (group[["fp", "doc_id"]].drop_duplicates()
          .sort_values(["fp", "doc_id"], kind="mergesort"))
    grp = df.groupby("fp", sort=False)
    rank = grp.cumcount()
    size = grp["doc_id"].transform("size")
    hot = (rank == 0) & (size > cap)
    n_dropped_total = int((size[hot] - cap).sum())
    kept = df[(rank < cap) & (size > 1)]
    if len(kept) == 0 and n_dropped_total == 0:
        return pd.DataFrame(_EMPTY_PAIRS)
    m = kept.merge(kept, on="fp")
    m = m[m["doc_id_x"] < m["doc_id_y"]]
    out = {
        "a": m["doc_id_x"].to_numpy(dtype=np.int64),
        "b": m["doc_id_y"].to_numpy(dtype=np.int64),
    }
    out["one"] = np.ones(len(out["a"]), np.int64)
    out["n_dropped"] = np.zeros(len(out["a"]), np.int64)
    if n_dropped_total:
        out = {k: np.append(v, x) for (k, v), x in
               zip(out.items(), (-1, -1, 0, n_dropped_total))}
    return pd.DataFrame(out)


def passage_pairs(ds, *, column: str = "text", id_column: str = "doc_id",
                  window: int = 32, guarantee: int = 64,
                  min_shared: int = 1, bucket_cap: int = 64,
                  n_buckets: int | None = None,
                  est_rows: int | None = None):
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints
    (i.e. likely sharing that many distinct long exact passages).
    Returns a Dataset of (a, b, n_shared, n_dropped) — rows with
    ``a == -1`` are hot-fingerprint truncation markers (``n_dropped``
    docs skipped for some fingerprint), never silent.

    Fingerprints are co-located by ``hash(fp) % n_buckets`` rather than
    one group per fp — the window-family bucketing pattern: one Python
    map_groups call per BUCKET, vectorized over all its fps, instead of
    per-fp dispatch. ``n_buckets`` scales with the fingerprint row
    estimate (``joins.resolve_n_buckets``) unless given; pass
    ``est_rows`` (input doc-count estimate) when ``ds`` has an
    expensive upstream plan — the fallback ``ds.count()`` re-executes
    that plan once just to size buckets (metadata-only and free for a
    bare parquet read, a full pass otherwise)."""
    from ray.data.aggregate import Sum

    from .joins import resolve_n_buckets

    fps = ds.map_batches(
        passage_fingerprint_batch,
        fn_kwargs={"column": column, "id_column": id_column,
                   "window": window, "guarantee": guarantee},
        batch_format="pyarrow",
    )
    if n_buckets is None:
        est = est_rows if est_rows is not None else ds.count()
        nb = resolve_n_buckets(est * 8 if est else None, n_buckets)
    else:
        nb = n_buckets

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t["fp"].to_numpy().view(np.uint64) % np.uint64(nb)).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    pairs = (
        fps.map_batches(add_bucket, batch_format="pyarrow",
                        zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(lambda g: _bucket_pairs(g, bucket_cap),
                    batch_format="pandas")
    )
    counted = pairs.groupby(["a", "b"]).aggregate(
        Sum("one", alias_name="n_shared"),
        Sum("n_dropped", alias_name="n_dropped"),
    )

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.or_(pc.greater_equal(t["n_shared"], min_shared),
                      pc.equal(t["a"], -1))
        return t.filter(mask)

    return counted.map_batches(keep, batch_format="pyarrow")
