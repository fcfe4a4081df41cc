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
