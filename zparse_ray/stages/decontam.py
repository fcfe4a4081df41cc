"""Benchmark decontamination: mark training documents that contain any
snippet from a (small) benchmark/eval set — the standard pre-training
hygiene pass (exact-substring flavor, as used for eval decontamination
in public LLM data pipelines).

Scale shape at 100 TB:
- the snippet set is the SMALL side: broadcast once (``ray.put`` for
  large sets, plain by-value ctor kwargs for tiny ones) and fetched
  once per actor in ``__init__`` — never re-shipped per batch;
- matching is embarrassingly parallel: each batch is scanned with one
  C-level ``pyarrow.compute.match_substring`` pass per snippet (K
  vectorized column scans, no Python loop over rows). This is the
  right shape while K is benchmark-sized (10^2–10^4). For much larger
  snippet sets the documented upgrade path is an Aho–Corasick automaton
  built once per actor (same actor-pool seam, O(text) per batch
  independent of K) or token-n-gram hashing into a broadcast sorted
  array + ``searchsorted`` membership (the asset-key-set pattern in
  ``pipelines/validate.py``);
- no shuffle anywhere: a document's hit count is computed entirely
  inside its own batch, so the output is a streamed filter of the
  input — per-doc results never leave the worker except as the
  (id, n_hits) rows that survive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from .textops import arrow_text_series


class SnippetMatcher:
    """Actor-pool ``map_batches`` callable: appends ``n_hits`` (int64) =
    number of distinct snippets contained in each row's ``text_col``.

    ``snippets`` may be a plain sequence of strings (small sets, passed
    by value) or a ``ray.ObjectRef`` to one (broadcast once with
    ``ray.put``); either way it is materialized ONCE per actor here in
    ``__init__``, per the stateful-stage rule.
    """

    def __init__(self, snippets, text_col: str = "text"):
        import ray

        if isinstance(snippets, ray.ObjectRef):
            snippets = ray.get(snippets)
        # dedup defensively (a duplicate snippet must not double-count)
        self.snippets = sorted(set(snippets))
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[self.text_col].combine_chunks(), "")
        hits = np.zeros(len(batch), np.int64)
        for snip in self.snippets:
            m = pc.match_substring(texts, pattern=snip)
            hits += m.to_numpy(zero_copy_only=False)
        return batch.append_column("n_hits", pa.array(hits, pa.int64()))


def mark_contaminated(
    ds,
    snippets,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 2,
):
    """Dataset of (id_col, n_hits) rows for documents containing >= 1
    benchmark snippet. Streaming end-to-end: scan -> per-batch
    vectorized match -> filter; no shuffle, no materialization."""
    import ray

    # broadcast large sets once; ship tiny ones by value
    payload = snippets
    if sum(len(s) for s in snippets) > 1 << 16:
        payload = ray.put(list(snippets))

    marked = ds.map_batches(
        SnippetMatcher,
        fn_constructor_kwargs={"snippets": payload, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        max_restarts=0,
    )

    def keep_hits(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_hits"], 0))
        return t.select([id_col, "n_hits"])

    return marked.map_batches(keep_hits, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# semantic decontamination (embedding-space flavor): flag rows whose
# embedding is near-parallel to any benchmark embedding — catches
# paraphrased/reformatted eval contamination that exact substrings miss


class EmbeddingDecontaminator:
    """Actor-pool ``map_batches`` callable: appends ``max_benchmark_cos``
    (float64) = the maximum cosine similarity of each row's
    ``vec_column`` against the broadcast benchmark matrix.

    ``benchmark`` is a (k, d) float array or a ``ray.ObjectRef`` to one
    — fetched ONCE per actor in ``__init__`` (rows are l2-normalized
    here; zero-norm benchmark rows are dropped). Per batch the work is
    one (n,d)@(d,k) matmul + a rowwise max — benchmark-sized k stays on
    the small side, the batch side streams. Zero shuffle."""

    def __init__(self, benchmark, vec_column: str = "embedding"):
        import ray

        if isinstance(benchmark, ray.ObjectRef):
            benchmark = ray.get(benchmark)
        b = np.atleast_2d(np.asarray(benchmark, dtype=np.float64))
        norms = np.linalg.norm(b, axis=1)
        b = b[norms > 0]
        self.bench = (b / np.linalg.norm(b, axis=1, keepdims=True)).T  # (d, k)
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .similarity import _to_matrix

        m = _to_matrix(batch[self.vec_column])
        if self.bench.shape[1] == 0 or m.size == 0:
            mx = np.zeros(batch.num_rows)
        else:
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            np.divide(m, norms, out=m, where=norms > 0)
            mx = (m @ self.bench).max(axis=1)
        return batch.append_column("max_benchmark_cos", pa.array(mx, pa.float64()))


def semantic_decontam(
    ds,
    benchmark,
    *,
    threshold: float = 0.95,
    vec_column: str = "embedding",
    mark: bool = False,
    concurrency: int = 2,
):
    """Drop (or with ``mark=True`` keep + annotate) rows whose max
    benchmark cosine is >= ``threshold``. ``benchmark`` is the SMALL
    side by contract (an eval set's embeddings): it is ``ray.put`` once
    here and read per actor, never re-shipped per batch."""
    import ray

    scored = ds.map_batches(
        EmbeddingDecontaminator,
        fn_constructor_kwargs={
            "benchmark": ray.put(np.asarray(benchmark, dtype=np.float64)),
            "vec_column": vec_column,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        max_restarts=0,
    )
    if mark:
        return scored

    def drop_hits(t: pa.Table) -> pa.Table:
        keep = pc.less(t["max_benchmark_cos"], threshold)
        return t.filter(keep).drop_columns(["max_benchmark_cos"])

    return scored.map_batches(drop_hits, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# token-n-gram decontamination (the GPT-3-style 13-gram-overlap flavor):
# robust to the whitespace/case reformatting that breaks exact-substring
# matching, cheaper than embeddings, and independent of snippet count
# per batch (one membership test over all windows at once)


def benchmark_ngram_hashes(snippets, *, n: int = 13) -> np.ndarray:
    """Sorted distinct polynomial hashes of every n-token window of the
    benchmark snippets (lowercased ``\\w+`` tokens — the MinHasher
    tokenization). Snippets shorter than ``n`` tokens contribute
    nothing (a document cannot overlap an n-gram that doesn't exist) —
    a warning is logged with their count so the loss is visible."""
    import logging

    import pandas as pd

    from .dedup import token_window_hashes

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    series = pd.Series(list(snippets), dtype=object).fillna("")
    n_short = int((series.str.lower().str.count(r"\w+") < n).sum())
    if n_short:
        logging.getLogger("zparse_ray.decontam").warning(
            "benchmark_ngram_hashes: %d of %d snippets have < %d tokens "
            "and contribute no n-grams", n_short, len(series), n,
        )
    sh, _, _ = token_window_hashes(series, n, short_run_fallback=False)
    if sh is None or len(sh) == 0:
        return np.empty(0, dtype=np.uint64)
    return np.unique(sh)


class NgramDecontaminator:
    """Actor-pool ``map_batches`` callable: appends ``n_gram_hits``
    (int64) = how many of the row's n-token windows hash into the
    broadcast benchmark n-gram set. The set is a ``ray.ObjectRef``
    fetched ONCE per actor; per batch the work is the shared
    prefix-sum window-hash pass + ONE ``searchsorted`` membership over
    all windows + a ``bincount`` per-doc reduction — no per-row Python,
    no per-snippet scans (unlike ``SnippetMatcher``, cost is
    independent of benchmark size). Matching is on 64-bit polynomial
    hashes: a false hit needs a hash collision (~#windows x
    #grams / 2^64 — negligible at any real scale, documented)."""

    def __init__(self, gram_hashes, *, n: int = 13, text_col: str = "text"):
        import ray

        if n < 1:
            raise ValueError(f"n must be >= 1, got {n}")
        if isinstance(gram_hashes, ray.ObjectRef):
            gram_hashes = ray.get(gram_hashes)
        self.grams = np.asarray(gram_hashes, dtype=np.uint64)
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import token_window_hashes

        texts = arrow_text_series(batch[self.text_col])
        hits = np.zeros(batch.num_rows, np.int64)
        sh, row_of_win, _ = token_window_hashes(
            texts, self.n, short_run_fallback=False
        )
        if sh is not None and len(sh) and len(self.grams):
            pos = np.searchsorted(self.grams, sh)
            pos = np.minimum(pos, len(self.grams) - 1)
            m = self.grams[pos] == sh
            hits = np.bincount(
                row_of_win[m], minlength=batch.num_rows
            ).astype(np.int64)
        return batch.append_column("n_gram_hits", pa.array(hits, pa.int64()))


def ngram_decontam(
    ds,
    snippets,
    *,
    n: int = 13,
    mark: bool = False,
    text_col: str = "text",
    concurrency: int = 2,
):
    """Drop (or with ``mark=True`` keep + annotate) documents sharing
    any n-token window with the benchmark ``snippets`` (strings). The
    gram-hash set is built driver-side (benchmark-sized by contract)
    and broadcast once."""
    import ray

    grams = benchmark_ngram_hashes(snippets, n=n)
    scored = ds.map_batches(
        NgramDecontaminator,
        fn_constructor_kwargs={
            "gram_hashes": ray.put(grams),
            "n": n,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        max_restarts=0,
    )
    if mark:
        return scored

    def drop_hits(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["n_gram_hits"], 0)
        return t.filter(keep).drop_columns(["n_gram_hits"])

    return scored.map_batches(drop_hits, batch_format="pyarrow", zero_copy_batch=True)
