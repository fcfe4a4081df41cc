"""Deterministic-sampling operators (stages/sample.py): SQL parity of
the Bernoulli hash rule, block-split invariance, per-group stratified
rates, and the exact-k bottom-k sampler vs a per-row reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zparse_ray.functions.sketches import hash64
from zparse_ray.stages.sample import (
    hash_sample,
    hash_topk_sample,
    rate_to_ppm,
    stratified_hash_sample,
)

SF = "/root/testdata/sf0.001"


def test_rate_to_ppm_bounds():
    assert rate_to_ppm(0.0) == 0
    assert rate_to_ppm(1.0) == 1_000_000
    assert rate_to_ppm(0.05) == 50_000
    with pytest.raises(ValueError, match="rate"):
        rate_to_ppm(1.5)


def test_hash_sample_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    got = sorted(hash_sample(ds, 0.1, seed=3).to_pandas()["doc_id"])
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"""SELECT doc_id FROM read_parquet('{SF}/documents.parquet')
                WHERE (CAST(doc_id AS HUGEINT) + 3) * 2654435761
                      % 18446744073709551616 % 1000000 < 100000"""
        ).fetchall()
    )
    assert got == want and 0 < len(got) < pq.read_metadata(f"{SF}/documents.parquet").num_rows


def test_hash_sample_invariant_to_block_splits(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    a = sorted(hash_sample(ds, 0.07).to_pandas()["doc_id"])
    b = sorted(hash_sample(ds.repartition(7), 0.07).to_pandas()["doc_id"])
    assert a == b


def test_stratified_hash_sample_rates(ray_session):
    import ray.data as rd

    n = 20_000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "lang": pa.array(["en", "de", "xx", "fr"] * (n // 4), pa.string()),
        }
    )
    out = stratified_hash_sample(
        rd.from_arrow(t).repartition(5),
        {"en": 0.5, "de": 0.1},
        default_rate=0.0,
    ).to_pandas()
    by = out.groupby("lang").size()
    assert "xx" not in by.index and "fr" not in by.index  # default 0 drops
    assert abs(by["en"] / (n / 4) - 0.5) < 0.03
    assert abs(by["de"] / (n / 4) - 0.1) < 0.03
    # rule is per-row deterministic: en rows kept are exactly the hash rule
    kept_en = set(out[out["lang"] == "en"]["doc_id"])
    ids = np.arange(0, n, 4, dtype=np.uint64)  # en rows
    want = {
        int(i)
        for i in ids[(ids * np.uint64(2654435761)) % np.uint64(10**6) < 500_000]
    }
    assert kept_en == want


def test_hash_topk_sample_exact_k_and_nested(ray_session):
    import ray.data as rd

    tab = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    ds = rd.from_arrow(tab).repartition(6)
    s20 = hash_topk_sample(ds, 20, seed=11)
    assert s20.num_rows == 20
    # per-row reference: the 20 smallest hash64(doc_id, seed=11)
    ids = tab["doc_id"].to_numpy()
    h = hash64(ids, seed=11)
    want = set(ids[np.argsort(h)[:20]].tolist())
    assert set(s20["doc_id"].to_pylist()) == want
    # nested property: bottom-5 is a subset of bottom-20
    s5 = hash_topk_sample(ds, 5, seed=11)
    assert set(s5["doc_id"].to_pylist()) <= want and s5.num_rows == 5
    # schema passes through unchanged (no helper column leaks)
    assert s20.column_names == ["doc_id", "lang"]


def test_hash_topk_sample_k_larger_than_input(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64())})
    out = hash_topk_sample(rd.from_arrow(t), 10)
    assert sorted(out["doc_id"].to_pylist()) == [1, 2, 3]
    with pytest.raises(ValueError, match="k must be positive"):
        hash_topk_sample(rd.from_arrow(t), 0)


# --- cross-corpus dedup (stages/dedup.py::cross_corpus_dedup) ---


def _corpus(texts, start_id=0):
    import pyarrow as pa

    return pa.table(
        {
            "doc_id": pa.array(range(start_id, start_id + len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


@pytest.mark.parametrize("method", ["broadcast", "bloom", "shuffle"])
def test_cross_corpus_dedup_drops_planted_overlap(ray_session, method):
    import ray.data as rd

    from zparse_ray.stages.dedup import cross_corpus_dedup

    ref = rd.from_arrow(_corpus(["alpha doc", "beta doc", "gamma doc", "beta doc"]))
    # candidate B/C collide after normalization (case / surrounding ws)
    cand = rd.from_arrow(
        _corpus(["  Beta DOC ", "GAMMA doc", "delta doc", "epsilon doc"], start_id=100)
    ).repartition(2)
    out = cross_corpus_dedup(cand, ref, method=method)
    kept = sorted(out.to_pandas()["doc_id"])
    assert kept == [102, 103]


@pytest.mark.parametrize("method", ["broadcast", "shuffle"])
def test_cross_corpus_dedup_mark_mode(ray_session, method):
    import ray.data as rd

    from zparse_ray.stages.dedup import cross_corpus_dedup

    ref = rd.from_arrow(_corpus(["one", "two"]))
    cand = rd.from_arrow(_corpus(["two", "three"], start_id=10))
    out = cross_corpus_dedup(cand, ref, method=method, mark=True).to_pandas()
    flags = dict(zip(out["doc_id"], out["in_reference"]))
    assert flags == {10: True, 11: False}
    assert "content_hash" not in out.columns and "__hit" not in out.columns


def test_cross_corpus_dedup_empty_reference(ray_session):
    import ray.data as rd

    from zparse_ray.stages.dedup import cross_corpus_dedup

    ref = rd.from_arrow(_corpus([]))
    cand = rd.from_arrow(_corpus(["a", "b"], start_id=5))
    out = cross_corpus_dedup(cand, ref, method="broadcast")
    assert sorted(out.to_pandas()["doc_id"]) == [5, 6]
    with pytest.raises(ValueError, match="unknown method"):
        cross_corpus_dedup(cand, ref, method="nope")


def test_reference_bloom_no_false_negatives(ray_session):
    import numpy as np
    import ray.data as rd

    from zparse_ray.stages.dedup import content_hash_batch, reference_bloom

    texts = [f"document number {i}" for i in range(500)]
    ref_tab = _corpus(texts)
    bloom = reference_bloom(rd.from_arrow(ref_tab).repartition(4), fpr=1e-4)
    h = content_hash_batch(ref_tab)["content_hash"].to_numpy()
    assert bloom.contains(h).all()  # every reference hash must hit
    other = content_hash_batch(_corpus([f"novel text {i}" for i in range(500)]))[
        "content_hash"
    ].to_numpy()
    assert bloom.contains(other).mean() < 0.01  # fpr holds with margin


# --- deterministic shuffle ---


def test_deterministic_shuffle_order_matches_hash_and_is_stable(ray_session):
    import ray.data as rd

    from zparse_ray.stages.sample import deterministic_shuffle

    tab = pa.table({"doc_id": pa.array(np.arange(1000), pa.int64())})
    a = deterministic_shuffle(rd.from_arrow(tab).repartition(4), seed=5)
    got = [r["doc_id"] for r in a.take_all()]
    ids = np.arange(1000)
    want = ids[np.argsort(hash64(ids, seed=5).view(np.int64), kind="stable")].tolist()
    assert got == want and got != ids.tolist()
    # block-layout invariance + schema passthrough
    b = deterministic_shuffle(rd.from_arrow(tab).repartition(9), seed=5)
    assert [r["doc_id"] for r in b.take_all()] == want
    assert a.schema().names == ["doc_id"]
    # different seed -> different order
    c = deterministic_shuffle(rd.from_arrow(tab), seed=6)
    assert [r["doc_id"] for r in c.take_all()] != want


# --- semantic decontamination (stages/decontam.py) ---


def test_semantic_decontam_flags_scaled_copies(ray_session):
    import ray.data as rd

    from zparse_ray.stages.decontam import semantic_decontam

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 16))
    # benchmark = rows 0-4; rows 10-14 are scaled copies (cos == 1)
    vecs[10:15] = vecs[0:5] * 3.25
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(50), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float64()),
            ),
        }
    )
    bench = vecs[0:5]
    ds = rd.from_arrow(tab).repartition(3)
    out = semantic_decontam(ds, bench, threshold=0.999).to_pandas()
    dropped = set(range(50)) - set(out["vec_id"])
    assert dropped == {0, 1, 2, 3, 4, 10, 11, 12, 13, 14}
    assert "max_benchmark_cos" not in out.columns

    # mark mode matches a brute-force per-row reference
    marked = semantic_decontam(ds, bench, mark=True).to_pandas()
    bn = bench / np.linalg.norm(bench, axis=1, keepdims=True)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    want = (vn @ bn.T).max(axis=1)
    got = marked.sort_values("vec_id")["max_benchmark_cos"].to_numpy()
    assert np.allclose(got, want, atol=1e-12)


def test_semantic_decontam_zero_norm_rows_kept(ray_session):
    import ray.data as rd

    from zparse_ray.stages.decontam import semantic_decontam

    tab = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[0.0, 0.0], [1.0, 0.0]], pa.list_(pa.float64())),
        }
    )
    out = semantic_decontam(
        rd.from_arrow(tab), np.array([[1.0, 0.0]]), threshold=0.9
    ).to_pandas()
    assert sorted(out["vec_id"]) == [0]  # zero vector: cos 0, kept; parallel: dropped


# --- review-pass regression tests ---


def test_hash_sample_rejects_negative_ids(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([-3, 1], pa.int64())})
    with pytest.raises(Exception, match="non-negative"):
        hash_sample(rd.from_arrow(t), 0.5).to_pandas()


def test_hash_topk_sample_string_ids_layout_invariant(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([f"d{i:03d}" for i in range(300)], pa.string())})
    a = hash_topk_sample(rd.from_arrow(t).repartition(2), 12, seed=4)
    b = hash_topk_sample(rd.from_arrow(t).repartition(11), 12, seed=4)
    assert sorted(a["doc_id"].to_pylist()) == sorted(b["doc_id"].to_pylist())
    assert a.num_rows == 12
    # helper-column collision is rejected loudly
    bad = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "_sample_h": pa.array([0], pa.int64())}
    )
    with pytest.raises(Exception, match="_sample_h"):
        hash_topk_sample(rd.from_arrow(bad), 1)


def test_semantic_decontam_accepts_1d_benchmark(ray_session):
    import ray.data as rd

    from zparse_ray.stages.decontam import semantic_decontam

    tab = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float64())),
        }
    )
    out = semantic_decontam(
        rd.from_arrow(tab), np.array([1.0, 0.0]), threshold=0.9
    ).to_pandas()
    assert sorted(out["vec_id"]) == [1]


# --- quantile-band filter (stages/stats.py::filter_by_quantile) ---


def test_filter_by_quantile_matches_rank_reference(ray_session):
    import math

    import ray.data as rd

    from zparse_ray.stages.stats import filter_by_quantile

    rng = np.random.default_rng(3)
    vals = rng.permutation(np.arange(1000)).astype(np.float64)
    tab = pa.table(
        {"doc_id": pa.array(np.arange(1000), pa.int64()),
         "score": pa.array(vals, pa.float64())}
    )
    out = filter_by_quantile(
        rd.from_arrow(tab).repartition(5), "score", lo=0.1, hi=0.9
    ).to_pandas()
    # reference thresholds use the engine's quantile_disc rank rule
    s = np.sort(vals)
    n = len(s)
    lo_v = s[math.ceil(0.1 * n) - 1]
    hi_v = s[math.ceil(0.9 * n) - 1]
    want = set(np.flatnonzero((vals >= lo_v) & (vals <= hi_v)).tolist())
    assert set(out["doc_id"]) == want


def test_filter_by_quantile_null_handling(ray_session):
    import ray.data as rd

    from zparse_ray.stages.stats import filter_by_quantile

    tab = pa.table(
        {"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
         "score": pa.array([1.0, None, 2.0, 3.0], pa.float64())}
    )
    dropped = filter_by_quantile(rd.from_arrow(tab), "score").to_pandas()
    assert sorted(dropped["doc_id"]) == [0, 2, 3]
    kept = filter_by_quantile(rd.from_arrow(tab), "score", keep_null=True).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 2, 3]
    with pytest.raises(ValueError, match="lo <= hi"):
        filter_by_quantile(rd.from_arrow(tab), "score", lo=0.9, hi=0.1)


# --- n-gram decontamination (stages/decontam.py::ngram_decontam) ---


def test_ngram_decontam_matches_per_row_reference(ray_session):
    import re

    import ray.data as rd

    from zparse_ray.stages.decontam import ngram_decontam

    tok = re.compile(r"\w+")
    bench = [
        "the quick brown fox jumps over",
        "pack my box with five dozen liquor jugs",
        "tiny",  # < n tokens -> contributes nothing
    ]
    n = 4
    docs = [
        "The  Quick\tBROWN fox JUMPS over the fence",  # reformatted overlap
        "a pristine document with no benchmark overlap at all here",
        "we pack my box with five dozen things",       # 4-gram overlap
        "quick brown fox",                             # only 3 tokens
        "",
    ]
    tab = pa.table(
        {"doc_id": pa.array(np.arange(len(docs)), pa.int64()),
         "text": pa.array(docs, pa.string())}
    )

    def ref_ngrams(text):
        t = [w.lower() for w in tok.findall(text)]
        return {tuple(t[i : i + n]) for i in range(len(t) - n + 1)}

    bench_grams = set().union(*(ref_ngrams(s) for s in bench))
    want_hits = [len(ref_ngrams(d) & bench_grams) > 0 for d in docs]

    marked = ngram_decontam(
        rd.from_arrow(tab).repartition(2), bench, n=n, mark=True
    ).to_pandas().sort_values("doc_id")
    got_flag = (marked["n_gram_hits"] > 0).tolist()
    assert got_flag == want_hits == [True, False, True, False, False]

    dropped = ngram_decontam(rd.from_arrow(tab), bench, n=n).to_pandas()
    assert sorted(dropped["doc_id"]) == [1, 3, 4]
    assert "n_gram_hits" not in dropped.columns


def test_ngram_decontam_counts_windows_not_snippets(ray_session):
    import ray.data as rd

    from zparse_ray.stages.decontam import ngram_decontam

    # doc repeats a benchmark 3-gram twice at different offsets
    tab = pa.table(
        {"doc_id": pa.array([0], pa.int64()),
         "text": pa.array(["alpha beta gamma X alpha beta gamma"], pa.string())}
    )
    out = ngram_decontam(
        rd.from_arrow(tab), ["alpha beta gamma"], n=3, mark=True
    ).to_pandas()
    assert out["n_gram_hits"].tolist() == [2]


# --- text normalization (stages/normalize.py) ---


def test_normalize_nfc_matches_duckdb():
    import duckdb

    from zparse_ray.stages.normalize import normalize_batch

    decomposed = "école précis"  # combining accents
    t = pa.table({"text": pa.array([decomposed, "plain"], pa.string())})
    got = normalize_batch(t, collapse_ws=False, strip_control=False)["text"].to_pylist()
    want = [
        duckdb.sql("SELECT nfc_normalize(?)", params=[s]).fetchone()[0]
        for s in [decomposed, "plain"]
    ]
    import unicodedata

    assert got == want
    assert got[0] == unicodedata.normalize("NFC", decomposed)
    assert decomposed != got[0]  # the input really was decomposed


def test_normalize_control_and_whitespace():
    from zparse_ray.stages.normalize import normalize_batch

    t = pa.table(
        {
            "text": pa.array(
                [
                    "a\x00b\x08c\x7fd",            # controls stripped
                    "keep\ttabs? no:  one  space",  # tab/space runs -> one space
                    "line1  \r\n\r\n\r\nline2",     # CRLF runs -> one \n
                    "mac\rline\x85break",           # lone CR / NEL -> \n, not deleted
                    "  trimmed  ",
                    None,
                ],
                pa.string(),
            )
        }
    )
    got = normalize_batch(t)["text"].to_pylist()
    assert got == [
        "abcd",
        "keep tabs? no: one space",
        "line1\nline2",
        "mac\nline\nbreak",
        "trimmed",
        None,
    ]


def test_normalize_nfc_beyond_mn_and_idempotent_splice():
    import unicodedata

    from zparse_ray.stages.normalize import normalize_batch

    jamo = "\u1100\u1161"          # Hangul jamo: composes with NO Mn char
    splice = "e\x00\u0301 after"   # control strip splices base+mark
    t = pa.table({"text": pa.array([jamo, splice, "\u212b"], pa.string())})
    got = normalize_batch(t)["text"].to_pylist()
    assert got[0] == unicodedata.normalize("NFC", jamo) == "\uac00"
    assert got[1].startswith("\u00e9")  # composed despite the spliced NUL
    assert got[2] == "\u00c5"           # singleton U+212B ANGSTROM -> Å
    # idempotence: a second pass is a fixpoint
    t2 = pa.table({"text": pa.array(got, pa.string())})
    assert normalize_batch(t2)["text"].to_pylist() == got


def test_normalize_preserves_large_string_type():
    from zparse_ray.stages.normalize import normalize_batch

    t = pa.table({"text": pa.array(["plain", "acce\u0301nt"], pa.large_string())})
    out = normalize_batch(t)
    assert out.schema.field("text").type == pa.large_string()
    assert out["text"].to_pylist()[1] == "acc\u00e9nt"


def test_normalize_dataset_streaming(ray_session):
    import ray.data as rd

    from zparse_ray.stages.normalize import normalize

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = normalize(docs).to_pandas()
    assert len(out) == docs.count()
    # idempotence: normalizing twice is a fixpoint
    t = pa.table({"text": pa.array(out["text"].tolist(), pa.string())})
    from zparse_ray.stages.normalize import normalize_batch

    assert normalize_batch(t)["text"].to_pylist() == out["text"].tolist()


def test_ngram_decontam_rejects_invalid_n():
    from zparse_ray.stages.decontam import benchmark_ngram_hashes

    with pytest.raises(ValueError, match="n must be"):
        benchmark_ngram_hashes(["a b c"], n=0)


def test_corpus_stats_tolerates_chunk_output_columns(ray_session):
    """The chunk pipeline's output already carries n_tokens; profiling
    it must not collide with the helper columns (reviewed bug)."""
    import ray.data as rd

    from zparse_ray.pipelines.corpus_stats import corpus_stats
    from zparse_ray.stages.chunk import chunk_documents

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    chunks = chunk_documents(docs, chunk_tokens=16)
    s = corpus_stats(chunks, lang_column=None)
    assert s["n_docs"] > 0 and s["token_quantiles"]["0.9"] <= 16.0
    assert s["n_null_lang"] == 0 and s["by_lang"] == {}


def test_grouped_cap_sample_matches_per_group_bottomk(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from zparse_ray.functions.sketches import hash64
    from zparse_ray.stages.sample import grouped_cap_sample, hash_topk_sample

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice(["siteA", "siteB", "siteC", "hotsite"], n,
                             p=[0.1, 0.1, 0.1, 0.7]),
        "text": [f"doc {i}" for i in range(n)],
    })
    ds = rd.from_pandas(df).repartition(5)
    out = grouped_cap_sample(ds, 12, group_column="source", seed=9)
    rows = out.take_all()
    got = {}
    for r in rows:
        got.setdefault(r["source"], set()).add(r["doc_id"])
    # per-group: exactly min(k, group size) rows, and they are the
    # group's bottom-k by (hash, id) — the hash_topk_sample order
    for src, grp in df.groupby("source"):
        ids = grp["doc_id"].to_numpy()
        h = hash64(ids, seed=9)
        want = set(ids[np.lexsort((ids, h))[:12]].tolist())
        assert got[src] == want, src
    # nesting parity: the grouped cap agrees with hash_topk_sample run
    # on one group alone
    one = rd.from_pandas(df[df["source"] == "hotsite"].reset_index(drop=True))
    tab = hash_topk_sample(one, 12, seed=9)
    assert set(tab["doc_id"].to_pylist()) == got["hotsite"]
    # schema untouched (no helper column), k validation
    assert set(rows[0]) == {"doc_id", "source", "text"}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive"):
        grouped_cap_sample(ds, 0, group_column="source")
