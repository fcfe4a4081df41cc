"""Measure training-data operator throughput on the reproducible
200k-doc corpus (BASELINE.md 'Training-data operator throughput'
methodology: 40x sf0.1 documents, doc_ids offset by 10M per replica,
texts prefixed 'rep{r} ' so replicas are not cross-doc duplicates).
Usage: python tools/bench_ops.py [op ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORPUS = "/tmp/bench_ops_corpus"
N_REP = 40


def build_corpus():
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if os.path.isdir(CORPUS) and os.listdir(CORPUS):
        return
    os.makedirs(CORPUS, exist_ok=True)
    base = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"])
    for r in range(N_REP):
        t = pa.table({
            "doc_id": pc.add(base["doc_id"], 10_000_000 * r).cast(pa.int64()),
            "text": pc.binary_join_element_wise(
                pa.array([f"rep{r} "] * base.num_rows, pa.string()),
                pc.cast(pc.fill_null(base["text"], ""), pa.string()), ""),
        })
        pq.write_table(t, os.path.join(CORPUS, f"part-{r:03d}.parquet"))


def main():
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    rd.DataContext.get_current().print_on_execution_start = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    build_corpus()

    def read():
        return rd.read_parquet(CORPUS, columns=["doc_id", "text"])

    n_docs = read().count()

    def run(name, fn):
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        print(json.dumps({"op": name, "wall_s": round(wall, 2),
                          "docs_per_s": round(n_docs / wall),
                          "n_docs": n_docs, "result": out}))

    ops = {}

    def op(f):
        ops[f.__name__] = f
        return f

    @op
    def pack_split():
        from zparse_ray.stages.pack import pack_sequences

        from ray.data.aggregate import Count, Sum

        a = pack_sequences(read(), seq_tokens=4096, mode="split").aggregate(
            Count(alias_name="n"), Sum("n_tokens", alias_name="tok"),
            Sum("pad_tokens", alias_name="pad"))
        return a

    @op
    def pack_whole():
        from ray.data.aggregate import Count, Sum

        from zparse_ray.stages.chunk import chunk_documents
        from zparse_ray.stages.pack import pack_sequences

        a = pack_sequences(
            chunk_documents(read(), chunk_tokens=512),
            seq_tokens=4096, mode="whole").aggregate(
            Count(alias_name="n"), Sum("n_tokens", alias_name="tok"),
            Sum("pad_tokens", alias_name="pad"))
        return a

    @op
    def passage_fps():
        # corpus-sized work only: the winnowed-fingerprint map stage
        # over the full 200k corpus (the replica corpus is an
        # adversarial 40-way-repeat case for the PAIR stage — every
        # passage co-buckets 40 docs, so end-to-end pair output there
        # measures the corpus's repeat density, not the operator)
        from zparse_ray.stages.passage import passage_fingerprint_batch

        # .count() consumes the stream (NOTE: a lone no-on Count() in a
        # global .aggregate() returns 0 on ray 2.49.2 — don't use it)
        n = read().map_batches(
            lambda t: passage_fingerprint_batch(t, window=32, guarantee=64),
            batch_format="pyarrow",
        ).count()
        return {"n_fps": n}

    @op
    def passage_pairs():
        # end-to-end mining on the NATURAL (un-replicated) table,
        # where repeats are the planted/coincidental ones the operator
        # is designed to surface
        import ray.data as rd

        from zparse_ray.stages.passage import passage_pairs as pp

        base = rd.read_parquet(
            os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"])
        n_base = base.count()
        rows = pp(base, window=32, guarantee=64, min_shared=2).take_all()
        real = sum(1 for r in rows if r["a"] >= 0)
        dropped = sum(r["n_dropped"] for r in rows if r["a"] == -1)
        return {"pairs": real, "n_dropped": int(dropped), "n_docs": n_base}

    @op
    def dedup_exact():
        import shutil

        from zparse_ray.pipelines.dedup_corpus import dedup_corpus

        out = "/tmp/bench_ops_dedup_exact"
        shutil.rmtree(out, ignore_errors=True)
        stats = dedup_corpus(CORPUS, out, mode="exact")
        return {"n_out": stats["n_docs_out"], "n_dropped": stats["n_dropped"]}

    @op
    def dedup_minhash():
        # the replica corpus is ADVERSARIALLY dup-heavy for near-dup
        # semantics: every 'rep{r} '-prefixed copy is a 0.9-Jaccard
        # near-dup of its 39 siblings, so all 5k families collapse and
        # the distributed verify stage carries the full O(families x
        # C(cap,2)) candidate load — the scale case the r5 rewrite
        # exists for (the old driver-bound verify pulled every pair +
        # text to the driver here)
        import shutil

        from zparse_ray.pipelines.dedup_corpus import dedup_corpus

        out = "/tmp/bench_ops_dedup_minhash"
        shutil.rmtree(out, ignore_errors=True)
        stats = dedup_corpus(CORPUS, out, mode="minhash", threshold=0.8)
        return {"n_out": stats["n_docs_out"], "n_dropped": stats["n_dropped"],
                "n_components": stats["n_neardup_components"],
                "n_truncated_slots": stats["n_truncated_slots"]}

    @op
    def ngram_repetition():
        from zparse_ray.stages.textops import ngram_repetition as nr

        n = nr(read()).count()
        return {"rows": n}

    @op
    def quality_train():
        # the BASELINE live-drive: plant deterministic junk (label 0)
        # beside real docs (label 1), hash-sample ~10% for training
        import numpy as np
        import pyarrow as pa

        from zparse_ray.stages.quality_clf import train_quality_classifier
        from zparse_ray.stages.sample import hash_sample

        def label_and_junk(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            junk = (ids % 10) == 3  # deterministic 10% junk rows
            texts = t["text"].to_pandas().fillna("")
            texts[junk] = "zz qq zz qq xx " * 20
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "label": pa.array((~junk).astype(np.int64), pa.int64()),
            })

        train = hash_sample(
            read().map_batches(label_and_junk, batch_format="pyarrow"), 0.1)
        model = train_quality_classifier(train, "label", iters=8)
        return {"nonzero_w": int((model.w != 0).sum())}

    names = sys.argv[1:] or list(ops)
    for n in names:
        run(n, ops[n])
    ray.shutdown()


if __name__ == "__main__":
    main()
