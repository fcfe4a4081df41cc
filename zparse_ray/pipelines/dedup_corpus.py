"""End-to-end corpus deduplication: documents parquet in → deduplicated
partitioned parquet out, with a per-run stats dict. The pipeline a
training-data curation run would actually execute, built from the
engine's dedup operators (stages/dedup.py) — the reference has no
cross-document operators (SURVEY §2.4), so this is north-rule surface.

Two modes:

- ``exact``: content-hash (normalized text) → keep the minimum-id doc
  per identical text. Scale shape: ONE shuffle of compact
  (hash, doc_id) rows picks winners; the winner-id set then flows into
  a bucketed semi-mark join (stages/joins.bucketed_semi_mark — one
  more id-only shuffle), so document TEXT never shuffles.

- ``minhash``: MinHash+LSH candidate pairs → exact-Jaccard verify at
  ``threshold`` → connected components (stages/dedup.
  connected_components, distributed min-label propagation) → keep the
  minimum-id doc per near-dup component. Identical texts have
  identical signatures, so exact dups collapse too. The candidate
  PAIR set (post-banding) is assumed driver-small — the standard LSH
  operating point (bands tuned so candidates ≈ true near-dups); the
  hot-bucket caps in lsh_candidate_pairs bound it and surface any
  truncation via marker rows.

Keep decisions are deterministic (min doc_id) — reruns reproduce the
same corpus. Output is one parquet file per input block
(``write_parquet`` directory), resumable by re-running into a fresh
directory.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger("zparse_ray.dedup_corpus")


def read_documents(input_path: str):
    """Format-dispatched corpus reader (S1's extension sniff applied to
    the table layer): parquet (default), JSONL (``.jsonl``/``.ndjson``
    — one document object per line) or CSV (``.csv``). Each maps to the
    matching Ray Data source so every format streams as blocks."""
    import ray.data as rd

    low = input_path.lower()
    if low.endswith((".jsonl", ".ndjson")):
        return rd.read_json(input_path)
    if low.endswith(".csv"):
        return rd.read_csv(input_path)
    # strip pandas schema metadata at the read: it makes pa.Schema
    # unhashable, so every block otherwise triggers Ray's schema-dedup
    # warning in the workers (the driver_queries._read precedent)
    import glob
    import os

    import pyarrow.parquet as pq

    one = input_path
    if os.path.isdir(input_path):
        files = sorted(glob.glob(os.path.join(input_path, "**", "*.parquet"),
                                 recursive=True))
        if files:
            one = files[0]
    try:
        schema = pq.read_schema(one).remove_metadata()
    except Exception:
        return rd.read_parquet(input_path)
    return rd.read_parquet(input_path, schema=schema)


def _keep_ids_exact(docs, id_column: str, text_column: str):
    """Winner (minimum) id per identical normalized text — returns a
    Dataset[(keep_id,)]. Only (hash, id) rows shuffle."""
    from ray.data.aggregate import Min

    from ..stages.dedup import content_hash_batch

    def project(t: pa.Table) -> pa.Table:
        h = content_hash_batch(t, column=text_column)
        return pa.table({"content_hash": h["content_hash"], "doc_id": t[id_column]})

    return (
        docs.map_batches(project, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keep_id"))
    )


def _drop_ids_minhash(docs, id_column: str, text_column: str, threshold: float):
    """Ids to DROP under near-dup semantics: every node of a near-dup
    component except its minimum id. Returns (drop_id numpy array,
    n_components, n_truncated_slots)."""
    import ray
    import ray.data as rd

    from ..stages.dedup import (
        MinHasher,
        connected_components,
        jaccard,
        lsh_candidate_pairs,
        shingles,
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t[id_column], "text": t[text_column]})

    named = docs.map_batches(rename, batch_format="pyarrow")
    # leave >= 1 CPU for the task-pool stages feeding the actor pool —
    # 2 actors on a 2-CPU cluster deadlock (actors hold every CPU while
    # waiting for input the starved read tasks can never produce)
    n_actors = max(1, min(2, int(ray.cluster_resources().get("CPU", 3)) - 1))
    bands = named.map_batches(MinHasher, batch_format="pyarrow", concurrency=n_actors)
    cand = bands.groupby(["band_id", "band_hash"]).map_groups(
        lsh_candidate_pairs, batch_format="pandas"
    )
    pairs, n_dropped = set(), 0
    for r in cand.take_all():
        if int(r["a"]) < 0:  # hot-bucket truncation marker
            n_dropped += int(r["n_dropped"])
        else:
            pairs.add((int(r["a"]), int(r["b"])))
    if n_dropped:
        logger.warning(
            "dedup_corpus: %d doc-slot drops from hot LSH buckets — near-dup "
            "recall reduced; raise the cap or band count", n_dropped,
        )
    if not pairs:
        return np.array([], dtype=np.int64), 0, n_dropped

    # exact verification on the candidate set only: broadcast the tiny
    # candidate id set, filter texts distributedly, pull only matches
    ids_ref = ray.put(pa.array(sorted({i for p in pairs for i in p}), pa.int64()))

    def filter_texts(t: pa.Table, *, ref) -> pa.Table:
        vs = ray.get(ref)
        return t.filter(pc.is_in(t["doc_id"], value_set=vs))

    texts = {
        r["doc_id"]: r["text"]
        for r in named.map_batches(
            filter_texts, fn_kwargs={"ref": ids_ref}, batch_format="pyarrow"
        ).take_all()
    }
    # shingle each candidate doc ONCE (a doc in P pairs would otherwise
    # re-tokenize P times; a capped hot bucket alone yields ~2k pairs)
    sh = {i: shingles(t) for i, t in texts.items()}
    verified = [
        (a, b) for a, b in sorted(pairs) if jaccard(sh[a], sh[b]) >= threshold
    ]
    if not verified:
        return np.array([], dtype=np.int64), 0, n_dropped

    edges = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in verified], pa.int64()),
                "b": pa.array([b for _, b in verified], pa.int64()),
            }
        )
    )
    labels = connected_components(edges, n_buckets=8)
    rows = labels.take_all()
    drop = np.array(
        [r["node"] for r in rows if r["node"] != r["component"]], dtype=np.int64
    )
    n_components = len({r["component"] for r in rows})
    return drop, n_components, n_dropped


def dedup_corpus(
    input_path: str,
    out_dir: str,
    *,
    mode: str = "exact",
    id_column: str = "doc_id",
    text_column: str = "text",
    threshold: float = 0.8,
    reference: str | None = None,
    cross_method: str = "broadcast",
) -> dict:
    """Run corpus dedup; write surviving rows as partitioned parquet
    under ``out_dir`` (must not already contain files — a dirty
    directory would mix runs and corrupt counts) and return a stats
    dict. With ``reference`` set, docs whose normalized content already
    exists in that corpus are dropped FIRST (incremental-ingestion
    dedup via ``stages.dedup.cross_corpus_dedup``; ``cross_method`` =
    broadcast | bloom | shuffle), then within-corpus dedup runs on the
    survivors."""
    import os

    import ray.data as rd

    from ..stages.joins import bucketed_semi_mark

    if mode not in ("exact", "minhash"):
        raise ValueError(f"unknown dedup mode: {mode!r}")
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"out_dir {out_dir!r} is not empty — refusing to mix runs")
    docs = read_documents(input_path)
    n_in = docs.count()

    cross_stats = {}
    if reference is not None:
        from ..stages.dedup import cross_corpus_dedup

        # broadcast/bloom build the reference set eagerly ONCE (it
        # lives in plasma); the returned dataset stays lazy, so the
        # multi-scan passes below just re-run the cheap per-batch
        # membership filter. shuffle mode re-runs its co-shuffle per
        # scan — exact-but-heavier, the no-driver-state trade.
        docs = cross_corpus_dedup(
            docs,
            read_documents(reference),
            column=text_column,
            method=cross_method,
            est_rows=n_in,
        )
        n_after_cross = docs.count()
        cross_stats = {"n_cross_dropped": int(n_in - n_after_cross)}
    n_base = n_in - cross_stats.get("n_cross_dropped", 0)

    if mode == "exact":
        # materialized: the winner-id set feeds both the survivor count
        # and the semi-mark, so the (hash, id) shuffle runs once
        keep = _keep_ids_exact(docs, id_column, text_column).materialize()
        marked = bucketed_semi_mark(
            docs, keep, left_on=id_column, key_col="keep_id", est_rows=n_base
        )

        def keep_hits(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["__hit"], 1)).drop_columns(["__hit"])

        out = marked.map_batches(keep_hits, batch_format="pyarrow")
        # survivor count = one winner per distinct content hash — a tiny
        # keyed aggregate over (hash, id) rows, NOT a re-scan of the
        # written corpus
        n_out = keep.count()
        extra = {}
    else:
        drop, n_components, n_truncated = _drop_ids_minhash(
            docs, id_column, text_column, threshold
        )
        if len(drop):
            import ray

            drop_ref = ray.put(pa.array(np.sort(drop), pa.int64()))

            def keep_rows(t: pa.Table, *, ref) -> pa.Table:
                import ray as _r

                return t.filter(
                    pc.invert(pc.is_in(t[id_column], value_set=_r.get(ref)))
                )

            out = docs.map_batches(keep_rows, fn_kwargs={"ref": drop_ref},
                                   batch_format="pyarrow")
        else:
            out = docs
        # ids are unique, so the survivor count is exact arithmetic
        n_out = n_base - len(drop)
        extra = {"n_neardup_components": n_components,
                 "n_truncated_slots": n_truncated}

    out.write_parquet(out_dir)
    return {
        "mode": mode,
        "n_docs_in": int(n_in),
        "n_docs_out": int(n_out),
        "n_dropped": int(n_in - n_out),
        "out_dir": out_dir,
        **cross_stats,
        **extra,
    }
