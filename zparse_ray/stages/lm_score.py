"""N-gram language-model perplexity scoring — the model-based quality
filter of public LLM data pipelines (CCNet / RefinedWeb style: score
every candidate document against an LM trained on a trusted reference
corpus; filter or stratify by perplexity).

Two halves, both Ray-Data-native:

- **Train** (``train_ngram_lm``): add-k-smoothed trigram LM. Counts
  are computed as per-batch partials (one explode + vectorized n-gram
  hashing per batch, no Python loop over rows/tokens) and combined by
  ONE ``groupby(h, kind).sum`` — the only shuffle, and it moves
  (hash, count) pairs, not text. The finished model is pulled to the
  driver as sorted hash/count arrays. At 100 TB this is the right
  shape because the TRAINING side is the small trusted reference
  corpus (wikipedia-sized, bounded vocabulary), never the full
  candidate corpus; the model itself is a broadcast side.

- **Score** (``PerplexityScorer``): actor-pool ``map_batches`` stage.
  The model ships as a ``ray.put`` ref fetched ONCE per actor in
  ``__init__`` (zero-copy plasma numpy views). Per batch: explode
  tokens, hash all trigram/bigram windows from shared shifted arrays,
  two ``searchsorted`` lookups against the sorted model arrays, one
  ``np.add.reduceat`` per-doc log-prob reduction — no per-row Python.

Smoothing: ``logp(w | ctx) = log(c3(ctx,w) + k) - log(c2(ctx) + k*V)``
with V = training vocabulary size; documents are framed with two BOS
sentinels so every token has a full trigram context. Perplexity is
``exp(-mean logp)``; zero-token documents score null.

N-gram identity is by 64-bit hash (no string n-gram materialization);
collisions merge counts, which is the standard hashed-LM trade and is
deterministic across train/score because both share ``_ngram_hash``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..functions.sketches import hash64
from .textops import arrow_text_series

# lowercase word tokens, ASCII + latin-1-ish letters with apostrophes —
# deliberately simple and shared verbatim by train and score.
_WORD = re.compile(r"[a-zà-ÿ']+", re.ASCII)

# BOS sentinel: a hash value no real token can produce (hash64 of a
# reserved marker), fixed for model stability across runs.
_BOS = np.uint64(hash64(np.array(["\x00bos\x00"], dtype=object))[0])

_A = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio mixers
_B = np.uint64(0xC2B2AE3D27D4EB4F)


def _finalize(h: np.ndarray) -> np.ndarray:
    """splitmix-style avalanche so combined hashes distribute."""
    h = h.copy()
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def _tri_hash(h1: np.ndarray, h2: np.ndarray, h3: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return _finalize(h1 * _A + h2 * _B + h3)


def _bi_hash(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return _finalize(h1 * _A + h2 * _B)


def _doc_window_hashes(batch: pa.Table, column: str):
    """Per-batch shared n-gram pass: returns (tri, bi, uni, row_starts,
    row_index) — ``tri[i]``/``bi[i]`` are the trigram / its context
    hash of window i, windows are grouped by row in order, ``row_starts``
    are the reduceat segment offsets into the window arrays for rows
    with >=1 token, ``row_index`` maps segments back to batch rows, and
    ``uni`` is the flat token-hash array (for vocabulary counting)."""
    s = arrow_text_series(batch[column], lower=True)
    toks = s.str.findall(_WORD)
    n_tok = toks.str.len().to_numpy(dtype=np.int64)
    rows = np.flatnonzero(n_tok > 0)
    if len(rows) == 0:
        e = np.zeros(0, np.uint64)
        return e, e, e, np.zeros(0, np.int64), rows
    ex = toks.explode().dropna()
    uni = hash64(ex.to_numpy(dtype=object))
    # flat buffer with 2 BOS sentinels inserted at each non-empty doc's
    # start: each doc with m tokens contributes exactly m trigram
    # windows (starting at its first BOS), all lying inside its own
    # padded segment — no cross-doc windows to mask.
    m = n_tok[rows]
    padded_len = m + 2
    starts = np.zeros(len(rows), np.int64)  # padded segment starts
    np.cumsum(padded_len[:-1], out=starts[1:])
    total = int(padded_len.sum())
    buf = np.full(total, _BOS, np.uint64)
    tok_pos = (
        np.arange(len(uni))
        + np.repeat(starts + 2 - np.concatenate([[0], np.cumsum(m)[:-1]]), m)
    )
    buf[tok_pos] = uni
    h1, h2, h3 = buf[:-2], buf[1:-1], buf[2:]
    win_idx = (
        np.arange(len(uni))
        - np.repeat(np.cumsum(m) - m, m)
        + np.repeat(starts, m)
    )
    tri = _tri_hash(h1[win_idx], h2[win_idx], h3[win_idx])
    bi = _bi_hash(h1[win_idx], h2[win_idx])
    row_starts = np.zeros(len(rows), np.int64)
    np.cumsum(m[:-1], out=row_starts[1:])
    return tri, bi, uni, row_starts, rows


@dataclass
class NgramLM:
    """Sorted-array trigram LM: the broadcastable model."""

    tri_h: np.ndarray  # sorted uint64
    tri_c: np.ndarray  # int64, aligned with tri_h
    bi_h: np.ndarray
    bi_c: np.ndarray
    vocab_size: int
    k: float = 1.0

    def _lookup(self, hs: np.ndarray, sorted_h: np.ndarray, counts: np.ndarray):
        idx = np.searchsorted(sorted_h, hs)
        idx_c = np.minimum(idx, len(sorted_h) - 1) if len(sorted_h) else idx
        hit = (len(sorted_h) > 0) & (idx < len(sorted_h))
        found = np.where(hit & (sorted_h[idx_c] == hs), counts[idx_c], 0)
        return found.astype(np.float64)

    def logprobs(self, tri: np.ndarray, bi: np.ndarray) -> np.ndarray:
        c3 = self._lookup(tri, self.tri_h, self.tri_c)
        c2 = self._lookup(bi, self.bi_h, self.bi_c)
        return np.log(c3 + self.k) - np.log(c2 + self.k * self.vocab_size)


def _count_partials(batch: pa.Table, column: str) -> pa.Table:
    """Per-batch (h, kind, n) partial counts; kind 0=tri 1=bi 2=uni.
    Hashes travel as int64 views (Arrow has no uint64 groupby issues to
    risk); counts are per-batch pre-aggregated so the shuffle moves
    O(distinct-per-batch) rows, not O(tokens)."""
    tri, bi, uni, _, _ = _doc_window_hashes(batch, column)
    hs, kinds, ns = [], [], []
    for kind, arr in ((0, tri), (1, bi), (2, uni)):
        if len(arr):
            u, c = np.unique(arr, return_counts=True)
            hs.append(u.view(np.int64))
            kinds.append(np.full(len(u), kind, np.int8))
            ns.append(c.astype(np.int64))
    if not hs:
        return pa.table(
            {
                "h": pa.array([], pa.int64()),
                "kind": pa.array([], pa.int8()),
                "n": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "h": pa.array(np.concatenate(hs), pa.int64()),
            "kind": pa.array(np.concatenate(kinds), pa.int8()),
            "n": pa.array(np.concatenate(ns), pa.int64()),
        }
    )


def train_ngram_lm(ds, column: str = "text", *, k: float = 1.0, min_count: int = 1) -> NgramLM:
    """Train the trigram LM over a (reference) corpus Dataset. One
    shuffle of (hash, kind, partial-count) rows; the driver receives
    only the final distinct-n-gram table (bounded by the reference
    corpus's vocabulary, NOT by candidate-corpus size). ``min_count``
    prunes rare trigrams/bigrams to bound the broadcast model."""
    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(lambda t: _count_partials(t, column), batch_format="pyarrow")
        .groupby(["h", "kind"])
        .aggregate(Sum("n", alias_name="n"))
    )
    rows = pa.Table.from_pylist(agg.take_all())
    if rows.num_rows == 0 or "h" not in rows.column_names:
        raise ValueError(
            "train_ngram_lm: reference corpus has no tokens — cannot train"
        )
    h = rows["h"].to_numpy().astype(np.int64).view(np.uint64)
    kind = rows["kind"].to_numpy()
    n = rows["n"].to_numpy().astype(np.int64)

    def pick(kd):
        m = kind == kd
        hh, nn = h[m], n[m]
        if kd in (0, 1) and min_count > 1:
            keep = nn >= min_count
            hh, nn = hh[keep], nn[keep]
        o = np.argsort(hh)
        return hh[o], nn[o]

    tri_h, tri_c = pick(0)
    bi_h, bi_c = pick(1)
    uni_h, _ = pick(2)
    return NgramLM(tri_h=tri_h, tri_c=tri_c, bi_h=bi_h, bi_c=bi_c,
                   vocab_size=int(len(uni_h)), k=k)


class PerplexityScorer:
    """Actor-pool ``map_batches`` callable: appends ``lm_logprob_avg``
    and ``perplexity`` (float64; null for zero-token rows). ``model``
    is an ``NgramLM`` or a ``ray.ObjectRef`` to one — fetched ONCE per
    actor here in ``__init__`` (plasma numpy views stay zero-copy)."""

    def __init__(self, model, text_col: str = "text"):
        import ray

        if isinstance(model, ray.ObjectRef):
            model = ray.get(model)
        self.model = model
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        tri, bi, _, row_starts, rows = _doc_window_hashes(batch, self.text_col)
        avg = np.full(batch.num_rows, np.nan)
        if len(rows):
            lp = self.model.logprobs(tri, bi)
            sums = np.add.reduceat(lp, row_starts)
            counts = np.diff(np.append(row_starts, len(lp)))
            avg[rows] = sums / counts
        ppl = np.exp(-avg)
        mask = np.isnan(avg)
        return batch.append_column(
            "lm_logprob_avg", pa.array(np.where(mask, None, avg), pa.float64())
        ).append_column(
            "perplexity", pa.array(np.where(mask, None, ppl), pa.float64())
        )


def score_perplexity(ds, model: NgramLM, *, concurrency: int = 2, **kwargs):
    """Dataset-level wrapper: broadcast the model once, stream the
    scoring stage."""
    import ray

    ref = ray.put(model)
    return ds.map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={"model": ref, **kwargs},
        batch_format="pyarrow",
        concurrency=concurrency,
        max_restarts=0,
    )
