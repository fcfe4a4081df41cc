"""Deduplication operators (exact + near-dup families).

Ray-Data-first shapes:

- exact: vectorized content-hash in ``map_batches`` ->
  ``groupby(hash).map_groups(head(1))``-equivalent keep-first — the
  hash-partition + per-group-first pattern (one shuffle of (hash, id),
  never of the text)
- MinHash+LSH: shingle -> minhash signature per batch (numpy matrix
  ops) -> explode to (band_id, band_hash, doc_id) rows ->
  ``groupby(band)`` -> candidate pairs -> verify exact Jaccard on the
  candidates only
- SimHash: 64-bit hyperplane-free simhash of token hashes; near-dups
  share the same value or differ in <= k bits (bucket by value here)
- n-gram Jaccard: exact verification kernel used on LSH candidates
- embedding cosine near-dup lives in stages/similarity.py

All heavy math is numpy per batch; shuffles move only compact
(hash, id) rows.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import hash64
from .textops import arrow_text_series

_TOKEN = re.compile(r"\w+")


def content_hash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Exact-dedup key: stable 64-bit hash of the normalized text
    (shared prep path; see ``textops.arrow_text_series`` for the
    measured pandas-vs-Arrow kernel choice)."""
    s = arrow_text_series(batch[column], lower=True).str.strip()
    h = hash64(s.to_numpy(dtype=object)).astype(np.int64)
    return batch.append_column("content_hash", pa.array(h, pa.int64()))


def shingles(text: str, k: int = 5) -> set[str]:
    toks = _TOKEN.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def token_hash_runs(texts, *, lowered: bool = False):
    """Tokenize + hash ONCE for reuse across several window sizes:
    returns ``(th uint64 | None, counts int64)`` — the flat lowercased
    ``_TOKEN`` token-hash array and per-doc token counts. Feed the
    result to ``token_window_hashes(..., pre=...)`` so a multi-n caller
    (e.g. the n-gram repetition signals) pays one explode, not one per
    n. Pass ``lowered=True`` when the series was already lowercased
    (e.g. by ``arrow_text_series(..., lower=True)``) to skip the
    per-element pandas lowering pass."""
    n_docs = len(texts)
    toks = (texts if lowered else texts.str.lower()).str.findall(_TOKEN)
    counts = toks.str.len().to_numpy().astype(np.int64)
    if int(counts.sum()) == 0:
        return None, np.zeros(n_docs, np.int64)
    flat = toks.explode().dropna().to_numpy(dtype=object)
    return hash64(flat), counts


def token_window_hashes(texts, k: int, *, short_run_fallback: bool, pre=None,
                        lowered: bool = False):
    """Shared vectorized k-token-window hashing (the MinHasher shingle
    machinery, reusable): lowercase ``_TOKEN`` tokens explode once,
    window hashes come from shared polynomial prefix sums over the flat
    token-hash array (boundaries masked per doc). Returns
    ``(window_hashes uint64 | None, row_of_win, n_win_per_doc)`` —
    ``None`` when the batch holds no tokens. With ``short_run_fallback``
    a doc with 0 < tokens < k hashes its full run as one window (the
    ``shingles()`` semantics); without it such docs yield no windows
    (exact n-gram semantics: a 5-token doc contains no 13-gram).
    ``pre`` takes a ``token_hash_runs(texts)`` result to skip the
    tokenize+hash pass when calling for several window sizes."""
    from ..stages.textops import _window_poly_hashes

    n_docs = len(texts)
    th, counts = token_hash_runs(texts, lowered=lowered) if pre is None else pre
    if th is None:
        return None, np.empty(0, np.int64), np.zeros(n_docs, np.int64)
    offsets = np.zeros(n_docs + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    short = (counts > 0).astype(np.int64) if short_run_fallback else 0
    n_win = np.where(counts >= k, counts - k + 1, short)
    total_win = int(n_win.sum())
    row_of_win = np.repeat(np.arange(n_docs), n_win)
    within = np.arange(total_win) - np.repeat(np.cumsum(n_win) - n_win, n_win)
    wstart = offsets[row_of_win] + within
    wlen = np.minimum(counts[row_of_win], k)
    sh = _window_poly_hashes(th, wstart, wstart + wlen)
    return sh, row_of_win, n_win


def pair_jaccard(texts_a, texts_b, k: int = 5) -> np.ndarray:
    """Vectorized exact shingle-Jaccard for aligned text pairs — the
    batch kernel of the DISTRIBUTED minhash verify stage (VERDICT r4
    item 1: no per-pair Python loop, no driver text dict). Semantics
    match ``jaccard(shingles(a, k), shingles(b, k))`` per row, with
    shingle identity tested via the shared 64-bit polynomial window
    hashes instead of joined strings (collision odds ~n^2/2^64 —
    negligible; pinned by the per-row reference-parity test).

    Shape: both sides' texts tokenize + window-hash in ONE
    ``token_window_hashes`` explode; per-doc shingle sets dedup via a
    (row, hash) lexsort; per-pair intersections come from one more
    (pair, hash) lexsort + adjacent-equality count. All C-level.
    """
    n = len(texts_a)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    if len(texts_b) != n:
        raise ValueError("pair_jaccard requires aligned equal-length sides")
    texts = pd.concat(
        [pd.Series(texts_a).reset_index(drop=True),
         pd.Series(texts_b).reset_index(drop=True)],
        ignore_index=True,
    ).fillna("")
    sh, row_of_win, _ = token_window_hashes(texts, k, short_run_fallback=True)
    if sh is None:  # no tokens anywhere: every pair is (empty, empty)
        return np.ones(n, dtype=np.float64)
    # dedup shingle hashes within each doc (set semantics)
    order = np.lexsort((sh, row_of_win))
    rs, ss = row_of_win[order], sh[order]
    first = np.empty(len(rs), dtype=bool)
    first[0] = True
    first[1:] = (rs[1:] != rs[:-1]) | (ss[1:] != ss[:-1])
    rs, ss = rs[first], ss[first]
    u = np.bincount(rs, minlength=2 * n)  # per-doc distinct-shingle counts
    # intersection per pair: a hash adjacent-equal under (pair, hash)
    # order appears once per side (sides are deduped), so each match is
    # exactly one shared shingle
    pair = rs % n
    order2 = np.lexsort((ss, pair))
    p2, s2 = pair[order2], ss[order2]
    match = (p2[1:] == p2[:-1]) & (s2[1:] == s2[:-1])
    inter = np.bincount(p2[:-1][match], minlength=n)
    union = u[:n] + u[n:] - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


class MinHasher:
    """Actor-pool stage: per-row minhash signature (n_perm permutations
    via the Kirsch-Mitzenmacher 2-hash trick) + LSH band hashes.

    Output: one row per (doc, band): (doc_id, band_id, band_hash) —
    the compact stream the LSH groupby shuffles.

    Fully vectorized across the batch (VERDICT r2 item 9 — no per-doc
    Python dispatch): tokens explode once, k-token shingle hashes come
    from shared polynomial prefix sums over the flat token-hash array
    (window boundaries masked per doc), and each permutation's per-doc
    min is one ``np.minimum.reduceat``. Docs shorter than ``shingle_k``
    tokens hash their full token run as the single shingle (the
    ``shingles()`` fallback); empty docs keep the all-max signature.
    """

    def __init__(self, n_perm: int = 128, n_bands: int = 16, shingle_k: int = 5):
        assert n_perm % n_bands == 0
        self.n_perm = n_perm
        self.n_bands = n_bands
        self.rows_per_band = n_perm // n_bands
        self.shingle_k = shingle_k
        rng = np.random.default_rng(0xD1CE)  # fixed: same permutations everywhere
        self.a = rng.integers(1, 2**61 - 1, n_perm, dtype=np.uint64)
        self.b = rng.integers(0, 2**61 - 1, n_perm, dtype=np.uint64)

    def _signatures(self, texts, *, lowered: bool = False) -> np.ndarray:
        """(n_perm, n_docs) minhash signatures for a pandas Series."""
        n_docs = len(texts)
        sig = np.full((self.n_perm, n_docs), np.iinfo(np.uint64).max, dtype=np.uint64)
        sh, _, n_win = token_window_hashes(texts, self.shingle_k,
                                           short_run_fallback=True, lowered=lowered)
        if sh is None:
            return sig
        # per-perm, per-doc min via reduceat over each doc's window run
        has_win = n_win > 0
        ws0 = (np.cumsum(n_win) - n_win)[has_win]
        with np.errstate(over="ignore"):
            for p in range(self.n_perm):
                vals = self.a[p] * sh + self.b[p]
                sig[p, has_win] = np.minimum.reduceat(vals, ws0)
        return sig

    def signature(self, text: str) -> np.ndarray:
        import pandas as pd

        return self._signatures(pd.Series([text]))[:, 0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = arrow_text_series(batch["text"], lower=True)
        ids = batch["doc_id"].to_numpy()
        n_docs = len(ids)
        sig = self._signatures(texts, lowered=True)  # (n_perm, n_docs)
        bands = sig.reshape(self.n_bands, self.rows_per_band, n_docs)
        with np.errstate(over="ignore"):
            acc = (bands * np.uint64(0x9E3779B9)).sum(axis=1, dtype=np.uint64)
        bh = hash64((bands[:, 0, :] ^ acc).ravel()).reshape(self.n_bands, n_docs)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids.astype(np.int64), self.n_bands), pa.int64()),
                "band_id": pa.array(
                    np.tile(np.arange(self.n_bands, dtype=np.int32), n_docs), pa.int32()
                ),
                "band_hash": pa.array(bh.T.ravel().astype(np.int64), pa.int64()),
            }
        )


def lsh_candidate_pairs(group: pd.DataFrame, *, star: bool = False,
                        cap: int = 64) -> pd.DataFrame:
    """map_groups body over (band_id, band_hash) groups. Two shapes:

    - ``star=False`` (default): ALL doc pairs in a bucket become
      candidates — O(k^2) per bucket; right when the consumer reports
      the PAIR set itself (``minhash_lsh_neardup``).
    - ``star=True``: each bucket emits only (min_id, other) edges —
      O(k) per bucket, the standard LSH-dedup shape. For a CONNECTED-
      COMPONENTS consumer the star preserves exactly the connectivity
      that survives verification against the bucket representative: a
      dup-heavy corpus (k-sized identical families) generates k-1 rows
      per bucket instead of k(k-2)/2 — on a 40-replica family that is
      20x less shuffle and 20x fewer exact-Jaccard verifies. Trade
      (documented in dedup_corpus): a member that fails to verify
      against the representative keeps its own doc even if it would
      have verified against some other member.

    Pathological (hot) buckets are capped at ``cap`` docs, and the
    truncation is NOT silent (ADVICE r2): a capped bucket emits one
    marker row ``(a=-1, b=-1, n_dropped=k)`` so callers can aggregate
    the recall loss; normal pair rows carry ``n_dropped=0``."""
    ids = np.unique(group["doc_id"].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": [], "n_dropped": []})
    n_dropped = max(0, len(ids) - cap)
    ids = ids[:cap]
    if star:
        a = np.full(len(ids) - 1, ids[0], dtype=np.int64)
        b = ids[1:].astype(np.int64)
    else:
        ii, jj = np.triu_indices(len(ids), k=1)
        a = ids[ii].astype(np.int64)
        b = ids[jj].astype(np.int64)
    nd = np.zeros(len(a), dtype=np.int64)
    if n_dropped:
        a = np.append(a, -1)
        b = np.append(b, -1)
        nd = np.append(nd, n_dropped)
    return pd.DataFrame({"a": a, "b": b, "n_dropped": nd})


def lsh_bucket_of(band_id: np.ndarray, band_hash: np.ndarray, n_buckets: int) -> np.ndarray:
    """Coarse co-location key for (band_id, band_hash) buckets: every
    row of one LSH bucket maps to the same coarse bucket, many LSH
    buckets share one coarse bucket."""
    with np.errstate(over="ignore"):
        mixed = band_hash.astype(np.uint64) + band_id.astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        )
    return (hash64(mixed, seed=7) % np.uint64(n_buckets)).astype(np.int32)


def lsh_candidate_pairs_batched(group: pd.DataFrame, *, star: bool = False,
                                cap: int = 64) -> pd.DataFrame:
    """Coarse-bucket candidate generation: ONE callback processes MANY
    (band_id, band_hash) buckets — the ``passage_pairs`` window-family
    bucketing pattern. ``groupby(band_id, band_hash).map_groups``
    dispatches a Ray call per TINY group (millions of ~40-row groups at
    corpus scale, where dispatch dwarfs the O(k) work); here segments
    are recovered with one lexsort and the star path is fully
    vectorized (all-pairs loops over segments in plain Python — no Ray
    per-group overhead). Emits exactly the union of
    ``lsh_candidate_pairs`` over the contained buckets (equivalence
    pinned by test), markers included."""
    band = group["band_id"].to_numpy().astype(np.int64)
    bh = group["band_hash"].to_numpy().astype(np.int64)
    ids = group["doc_id"].to_numpy().astype(np.int64)
    if len(ids) == 0:
        return pd.DataFrame({"a": [], "b": [], "n_dropped": []})
    order = np.lexsort((ids, bh, band))
    band, bh, ids = band[order], bh[order], ids[order]
    # drop duplicate (bucket, id) rows (np.unique parity with the
    # per-group kernel), then find bucket segments
    keep = np.empty(len(ids), bool)
    keep[0] = True
    keep[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1]) | (ids[1:] != ids[:-1])
    band, bh, ids = band[keep], bh[keep], ids[keep]
    seg = np.empty(len(ids), bool)
    seg[0] = True
    seg[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    starts = np.flatnonzero(seg)
    counts = np.diff(np.append(starts, len(ids)))
    multi = counts >= 2
    if not multi.any():
        return pd.DataFrame({"a": [], "b": [], "n_dropped": []})
    s2, c2 = starts[multi], counts[multi]
    kept = np.minimum(c2, cap)
    dropped = c2 - kept
    if star:
        # a = each segment's first (minimum) id, b = its next kept-1 ids
        n_b = kept - 1
        a = np.repeat(ids[s2], n_b)
        within = np.arange(int(n_b.sum())) - np.repeat(np.cumsum(n_b) - n_b, n_b)
        b = ids[np.repeat(s2, n_b) + 1 + within]
        nd = np.zeros(len(a), dtype=np.int64)
    else:
        a_parts, b_parts = [], []
        for st, k in zip(s2, kept):
            ii, jj = np.triu_indices(int(k), k=1)
            a_parts.append(ids[st + ii])
            b_parts.append(ids[st + jj])
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        nd = np.zeros(len(a), dtype=np.int64)
    n_marks = int((dropped > 0).sum())
    if n_marks:
        a = np.append(a, np.full(n_marks, -1, np.int64))
        b = np.append(b, np.full(n_marks, -1, np.int64))
        nd = np.append(nd, dropped[dropped > 0])
    return pd.DataFrame({"a": a, "b": b, "n_dropped": nd})


def lsh_candidate_pair_stream(bands, *, star: bool = False, cap: int = 64,
                              est_rows: int | None = None,
                              n_buckets: int | None = None):
    """The candidate-pair Dataset from a (doc_id, band_id, band_hash)
    band stream: coarse-bucket co-location + the batched kernel —
    one shuffle, O(coarse buckets) Python dispatches instead of
    O(LSH buckets)."""
    from .joins import resolve_n_buckets

    nb = resolve_n_buckets(est_rows, n_buckets)

    def add_cb(t: pa.Table) -> pa.Table:
        cb = lsh_bucket_of(
            t["band_id"].to_numpy().astype(np.int64),
            t["band_hash"].to_numpy(),
            nb,
        )
        return t.append_column("__cb", pa.array(cb, pa.int32()))

    return (
        bands.map_batches(add_cb, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__cb")
        .map_groups(
            lambda g: lsh_candidate_pairs_batched(g, star=star, cap=cap),
            batch_format="pandas",
        )
    )


class SimHasher:
    """64-bit SimHash over token hashes.

    ``__call__`` is fully vectorized across the batch (VERDICT r3 item
    3, the MinHasher shape): tokens explode once, hash flat, and each
    bit position's ±1 vote total per doc is ONE ``np.add.reduceat``
    over the doc's token segment (votes are 2*ones - n_tokens, so only
    the ones-count reduces). No per-row Python dispatch.

    ``simhash()`` is the per-row reference implementation the batch
    path is equivalence-tested against (bit-identical by construction:
    hash64 is elementwise and integer vote sums are order-free).
    """

    def __init__(self):
        self.token = _TOKEN

    def simhash(self, text: str) -> int:
        toks = self.token.findall(text.lower())
        if not toks:
            return 0
        h = hash64(np.array(toks, dtype=object))
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int32
        )
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def _simhashes(self, texts, *, lowered: bool = False) -> np.ndarray:
        """(n_docs,) uint64 simhashes for a pandas Series of texts."""
        n_docs = len(texts)
        out = np.zeros(n_docs, dtype=np.uint64)
        toks = (texts if lowered else texts.str.lower()).str.findall(self.token)
        counts = toks.str.len().to_numpy().astype(np.int64)
        if int(counts.sum()) == 0:
            return out
        flat = toks.explode().dropna().to_numpy(dtype=object)
        th = hash64(flat)
        has_tok = counts > 0
        seg_starts = (np.cumsum(counts) - counts)[has_tok]
        n_tok = counts[has_tok]
        sim = np.zeros(len(n_tok), dtype=np.uint64)
        for p in range(64):
            ones = np.add.reduceat((th >> np.uint64(p)) & np.uint64(1), seg_starts)
            # bit set iff vote total 2*ones - n > 0
            sim |= (2 * ones.astype(np.int64) > n_tok).astype(np.uint64) << np.uint64(p)
        out[has_tok] = sim
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = arrow_text_series(batch["text"], lower=True)
        vals = self._simhashes(s, lowered=True).astype(np.int64)
        return batch.append_column("simhash", pa.array(vals, pa.int64()))


def simhash_band_explode(batch: pa.Table, *, n_bands: int = 4) -> pa.Table:
    """Hamming-<=k neighbor search, band pigeonhole (k = n_bands - 1):
    two 64-bit simhashes within hamming distance k agree on at least one
    of n_bands disjoint bit-bands, so exploding each fingerprint into
    (band_id, band_bits) rows and grouping by them surfaces every <=k
    candidate pair in a compact shuffle of n_bands rows per doc. The
    exact hamming check on candidates removes pigeonhole false
    positives."""
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    sims = batch["simhash"].to_numpy().astype(np.uint64)
    ids = batch["doc_id"].to_numpy()
    n = len(sims)
    doc_out = np.repeat(ids, n_bands)
    band_out = np.tile(np.arange(n_bands, dtype=np.int32), n)
    shifts = (np.arange(n_bands, dtype=np.uint64) * np.uint64(width))[None, :]
    bits = ((sims[:, None] >> shifts) & mask).reshape(-1)
    return pa.table(
        {
            "doc_id": pa.array(doc_out, pa.int64()),
            "band_id": pa.array(band_out, pa.int32()),
            "band_bits": pa.array(bits.astype(np.int64), pa.int64()),
            "simhash": pa.array(np.repeat(sims, n_bands).astype(np.int64), pa.int64()),
        }
    )


def connected_components(edges_ds, *, max_rounds: int = 50, n_buckets: int | None = None,
                         est_rows: int | None = None):
    """Connected components over an (a, b) int64 edge Dataset — the
    step that turns a near-dup PAIR list into dedup GROUPS (keep one
    doc per component). Returns a Dataset[(node, component)] where
    ``component`` is the minimum node id in the node's component.

    Scale shape: iterative min-label propagation. Each round is ONE
    bucketed hash-shuffle join (labels ⋈ directed edges, reusing
    stages/joins' skew-safe bucketing) plus a keyed Min aggregate —
    O(E) rows move per round and labels stay distributed; the driver
    sees one number per round (the global label sum) to detect the
    fixpoint. Rounds needed = O(component diameter); near-dup
    components are near-cliques, so 2-3 rounds in practice. Per-round
    ``materialize()`` bounds lineage depth (labels are O(V), far
    smaller than the corpus the pairs came from)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from .joins import bucketed_shuffle_join

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = edges_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()
    # block-count discipline: edges arriving through upstream bucketed
    # joins carry O(buckets) tiny blocks, and each round's union would
    # otherwise COMPOUND label blocks (measured 240 -> 720 -> ... on a
    # 435k-edge corpus, turning ~5 s rounds into 50 s of shuffle-task
    # overhead) — repartition edges once and labels every round to a
    # count sized by rows, not by upstream bucket fan-out
    n_edge_rows = edges.count()
    n_blocks = int(min(128, max(8, n_edge_rows // 500_000 + 1)))
    edges = edges.repartition(n_blocks).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        # neighbor-min seed: label(v) = min(v, min neighbor) — one free
        # half-step of propagation (a star component converges at init;
        # the loop then only pays its confirmation round)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([src, src]), pa.int64()),
                "component": pa.array(np.concatenate([np.minimum(src, dst), src]), pa.int64()),
            }
        )

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("component", alias_name="component"))
        .repartition(n_blocks)
        .materialize()
    )
    if labels.count() == 0:
        return labels
    prev_sum = labels.sum("component")
    converged = False
    for _ in range(max_rounds):
        prop = bucketed_shuffle_join(
            edges, labels, left_on="src", right_on="node",
            n_buckets=n_buckets, est_rows=est_rows,
        )

        def msg(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["dst"], "component": t["component"]})

        labels = (
            prop.map_batches(msg, batch_format="pyarrow")
            .union(labels)
            .groupby("node")
            .aggregate(Min("component", alias_name="component"))
            .repartition(n_blocks)
            .materialize()
        )
        s = labels.sum("component")
        if s == prev_sum:  # min-labels are monotone non-increasing
            converged = True
            break
        prev_sum = s
    if not converged:
        # round exhaustion must not pass for convergence: the labels are
        # WRONG (components still split) — a chain-shaped component with
        # diameter > max_rounds needs more rounds
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} rounds "
            f"(component diameter exceeds it) — raise max_rounds"
        )
    return labels


def simhash_candidate_pairs(group: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    """map_groups body over (band_id, band_bits) buckets: exact-hamming
    verify within the bucket; emits (a, b, hamming) pairs <= max_hamming.
    Bucket sizes are capped like lsh_candidate_pairs, and a capped
    bucket emits a ``(a=-1, b=-1, hamming=-1, n_dropped=k)`` marker row
    so truncation is visible to callers (ADVICE r2); normal rows carry
    ``n_dropped=0``."""
    sub = group.drop_duplicates("doc_id").sort_values("doc_id")
    ids = sub["doc_id"].to_numpy()
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": [], "hamming": [], "n_dropped": []})
    cap = 64
    n_dropped = max(0, len(ids) - cap)
    ids = ids[:cap]
    sims = sub["simhash"].to_numpy()[:cap].astype(np.uint64)
    ii, jj = np.triu_indices(len(ids), k=1)
    x = sims[ii] ^ sims[jj]
    ham = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    m = ham <= max_hamming
    a = ids[ii[m]].astype(np.int64)
    b = ids[jj[m]].astype(np.int64)
    h = ham[m]
    nd = np.zeros(len(a), dtype=np.int64)
    if n_dropped:
        a = np.append(a, -1)
        b = np.append(b, -1)
        h = np.append(h, -1)
        nd = np.append(nd, n_dropped)
    return pd.DataFrame({"a": a, "b": b, "hamming": h, "n_dropped": nd})


def simhash_candidate_pairs_batched(group: pd.DataFrame, *, max_hamming: int = 3,
                                    cap: int = 64) -> pd.DataFrame:
    """Coarse-bucket variant of ``simhash_candidate_pairs`` (the
    ``lsh_candidate_pairs_batched`` pattern): one callback processes
    many (band_id, band_bits) buckets; segments recovered with one
    lexsort, exact-hamming verify vectorized per segment. Emits the
    union of the per-bucket kernel's outputs, markers included."""
    band = group["band_id"].to_numpy().astype(np.int64)
    bits = group["band_bits"].to_numpy().astype(np.int64)
    ids = group["doc_id"].to_numpy().astype(np.int64)
    sims = group["simhash"].to_numpy().astype(np.int64)
    if len(ids) == 0:
        return pd.DataFrame({"a": [], "b": [], "hamming": [], "n_dropped": []})
    order = np.lexsort((ids, bits, band))
    band, bits, ids, sims = band[order], bits[order], ids[order], sims[order]
    keep = np.empty(len(ids), bool)
    keep[0] = True
    keep[1:] = (band[1:] != band[:-1]) | (bits[1:] != bits[:-1]) | (ids[1:] != ids[:-1])
    band, bits, ids, sims = band[keep], bits[keep], ids[keep], sims[keep]
    seg = np.empty(len(ids), bool)
    seg[0] = True
    seg[1:] = (band[1:] != band[:-1]) | (bits[1:] != bits[:-1])
    starts = np.flatnonzero(seg)
    counts = np.diff(np.append(starts, len(ids)))
    a_p, b_p, h_p, drops = [], [], [], []
    for st, c in zip(starts, counts):
        if c < 2:
            continue
        k = min(int(c), cap)
        if c > cap:
            drops.append(int(c - cap))
        sid = ids[st:st + k]
        ssim = sims[st:st + k].astype(np.uint64)
        ii, jj = np.triu_indices(k, k=1)
        x = ssim[ii] ^ ssim[jj]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        m = ham <= max_hamming
        a_p.append(sid[ii[m]])
        b_p.append(sid[jj[m]])
        h_p.append(ham[m])
    a = np.concatenate(a_p) if a_p else np.empty(0, np.int64)
    b = np.concatenate(b_p) if b_p else np.empty(0, np.int64)
    h = np.concatenate(h_p) if h_p else np.empty(0, np.int64)
    nd = np.zeros(len(a), dtype=np.int64)
    if drops:
        a = np.append(a, np.full(len(drops), -1, np.int64))
        b = np.append(b, np.full(len(drops), -1, np.int64))
        h = np.append(h, np.full(len(drops), -1, np.int64))
        nd = np.append(nd, np.asarray(drops, np.int64))
    return pd.DataFrame({"a": a, "b": b, "hamming": h, "n_dropped": nd})


def simhash_candidate_pair_stream(exploded, *, max_hamming: int = 3, cap: int = 64,
                                  est_rows: int | None = None,
                                  n_buckets: int | None = None):
    """Candidate-pair Dataset from a ``simhash_band_explode`` stream:
    coarse-bucket co-location + the batched hamming kernel."""
    from .joins import resolve_n_buckets

    nb = resolve_n_buckets(est_rows, n_buckets)

    def add_cb(t: pa.Table) -> pa.Table:
        cb = lsh_bucket_of(
            t["band_id"].to_numpy().astype(np.int64),
            t["band_bits"].to_numpy(),
            nb,
        )
        return t.append_column("__cb", pa.array(cb, pa.int32()))

    return (
        exploded.map_batches(add_cb, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__cb")
        .map_groups(
            lambda g: simhash_candidate_pairs_batched(
                g, max_hamming=max_hamming, cap=cap
            ),
            batch_format="pandas",
        )
    )


# ---------------------------------------------------------------------------
# cross-corpus exact dedup (incremental-ingestion dedup: drop candidate
# docs whose normalized content already exists in a reference corpus)


def _distinct_hash_partial(batch: pa.Table, *, column: str) -> pa.Table:
    """Per-batch combiner: normalized content hashes, deduped BEFORE
    anything leaves the task (only distinct int64s move)."""
    h = content_hash_batch(batch, column)["content_hash"].to_numpy()
    return pa.table({"content_hash": pa.array(np.unique(h), pa.int64())})


def reference_hash_array(ds, *, column: str = "text") -> np.ndarray:
    """Sorted distinct content hashes of a corpus. Streams per-batch
    distinct partials to the driver and folds incrementally — driver
    memory is O(distinct hashes), 8 bytes each. Fine up to ~10^9
    distinct docs; beyond that use ``method='shuffle'`` (no driver
    state) or sharded Bloom actors (``stages/uniqueness.py``)."""
    partials = ds.map_batches(
        _distinct_hash_partial,
        fn_kwargs={"column": column},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # fold with PERIODIC compaction — a per-batch union1d would re-sort
    # the whole growing accumulator every iteration (O(B * n log n)
    # driver CPU); instead buffer raw parts and np.unique only when the
    # buffered rows exceed the merged size, keeping total work
    # O(n log n)-ish and peak memory within ~2x of the distinct set
    merged = np.empty(0, dtype=np.int64)
    pending: list[np.ndarray] = []
    n_pending = 0
    for part in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        arr = part["content_hash"].to_numpy()
        pending.append(arr)
        n_pending += len(arr)
        if n_pending > max(1_000_000, len(merged)):
            merged = np.unique(np.concatenate([merged, *pending]))
            pending, n_pending = [], 0
    if pending:
        merged = np.unique(np.concatenate([merged, *pending]))
    return merged


def reference_bloom(ds, *, column: str = "text", capacity: int | None = None, fpr: float = 1e-4):
    """Bloom filter over a corpus's content hashes, built on the driver
    from the streamed distinct partials (memory O(n_bits), never the
    hash set). No false negatives; ~``fpr`` of non-duplicate candidates
    are wrongly dropped — the documented approximation of the bloom
    mode. ``capacity`` defaults to ``ds.count()`` (an upper bound on
    distinct hashes; parquet reads answer it from metadata)."""
    from ..functions.sketches import BloomFilter

    if capacity is None:
        capacity = max(1, ds.count())
    bloom = BloomFilter.for_capacity(capacity, fpr)
    partials = ds.map_batches(
        _distinct_hash_partial,
        fn_kwargs={"column": column},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    for part in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        bloom.add(part["content_hash"].to_numpy())
    return bloom


class _CrossCorpusFilter:
    """Actor-pool stage: membership of each candidate doc's content
    hash in the broadcast reference set (sorted array -> searchsorted,
    or Bloom -> contains). The set is a ``ray.ObjectRef`` fetched ONCE
    per actor here (plasma numpy views stay zero-copy across actors on
    a node)."""

    def __init__(self, ref, *, kind: str, column: str, mark: bool):
        import ray

        obj = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.kind = kind
        self.obj = obj
        self.column = column
        self.mark = mark

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = content_hash_batch(batch, self.column)["content_hash"].to_numpy()
        if self.kind == "sorted":
            pos = np.searchsorted(self.obj, h)
            pos = np.minimum(pos, max(0, len(self.obj) - 1))
            hit = (self.obj[pos] == h) if len(self.obj) else np.zeros(len(h), bool)
        else:  # bloom
            hit = self.obj.contains(h)
        if self.mark:
            return batch.append_column("in_reference", pa.array(hit, pa.bool_()))
        return batch.filter(pa.array(~hit))


def cross_corpus_dedup(
    candidates,
    reference,
    *,
    column: str = "text",
    method: str = "broadcast",
    mark: bool = False,
    fpr: float = 1e-4,
    concurrency: int | None = None,
    est_rows: int | None = None,
):
    """Drop (or with ``mark=True`` flag) candidate docs whose normalized
    content hash appears in ``reference`` — the incremental-ingestion
    dedup (new crawl vs existing corpus). Three scale shapes:

    - ``broadcast`` (exact): reference distinct hashes -> sorted array
      broadcast once via ``ray.put``; candidates stream through an
      actor-pool searchsorted filter. Zero shuffle; right when the
      reference's distinct-hash set fits memory (~10^9 docs = 8 GB).
    - ``bloom`` (approximate, no false negatives): same stream shape
      with a Bloom filter in O(n_bits) instead of the hash set; ~fpr
      of unique candidates are wrongly dropped (documented).
    - ``shuffle`` (exact, both sides unbounded): ONE bucketed co-shuffle
      of (hash, row) via ``joins.bucketed_semi_mark`` — no driver or
      broadcast state at all; the 10^12 x 10^12 path. Pass ``est_rows``
      (candidate row count) so the bucket count scales with the data —
      without it the semi-mark falls back to a fixed 64 buckets, the
      multi-GB-single-task failure ``resolve_n_buckets`` exists to fix.

    ``concurrency`` sizes the filter actor pool (broadcast/bloom);
    default scales with the cluster, capped below total CPUs so the
    feeding task stages are never starved (the 2-CPU deadlock rule).
    """
    if method in ("broadcast", "bloom"):
        import ray

        if concurrency is None:
            total_cpus = int(ray.cluster_resources().get("CPU", 3))
            concurrency = max(1, min(8, total_cpus - 1))
        obj = (
            reference_hash_array(reference, column=column)
            if method == "broadcast"
            else reference_bloom(reference, column=column, fpr=fpr)
        )
        return candidates.map_batches(
            _CrossCorpusFilter,
            fn_constructor_kwargs={
                "ref": ray.put(obj),
                "kind": "sorted" if method == "broadcast" else "bloom",
                "column": column,
                "mark": mark,
            },
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
            max_restarts=0,
        )
    if method != "shuffle":
        raise ValueError(f"unknown method {method!r} (broadcast | bloom | shuffle)")
    from .joins import bucketed_semi_mark

    cand = candidates.map_batches(
        content_hash_batch, fn_kwargs={"column": column},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ref = reference.map_batches(
        _distinct_hash_partial, fn_kwargs={"column": column},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    marked = bucketed_semi_mark(
        cand, ref, left_on="content_hash", key_col="content_hash", est_rows=est_rows
    )
    if mark:
        def to_bool(t: pa.Table) -> pa.Table:
            hit = t["__hit"].to_numpy().astype(bool)
            return t.drop_columns(["__hit", "content_hash"]).append_column(
                "in_reference", pa.array(hit, pa.bool_())
            )

        return marked.map_batches(to_bool, batch_format="pyarrow", zero_copy_batch=True)

    def drop_hits(t: pa.Table) -> pa.Table:
        keep = t["__hit"].to_numpy() == 0
        return t.filter(pa.array(keep)).drop_columns(["__hit", "content_hash"])

    return marked.map_batches(drop_hits, batch_format="pyarrow", zero_copy_batch=True)
