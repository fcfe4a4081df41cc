"""Repeated-passage mining tests: batch/reference winnowing parity,
the winnowing guarantee property, and the pair pipeline."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from zparse_ray.stages.passage import (
    passage_fingerprint_batch,
    passage_pairs,
    winnow_reference,
)

W, G = 16, 24


def _fp_sets(df, **kw):
    t = pa.Table.from_pandas(df, preserve_index=False)
    out = passage_fingerprint_batch(t, window=kw.get("window", W),
                                    guarantee=kw.get("guarantee", G))
    got: dict[int, set] = {i: set() for i in df["doc_id"]}
    for d, f in zip(out["doc_id"].to_pylist(), out["fp"].to_pylist()):
        got[d].add(f & 0xFFFFFFFFFFFFFFFF)
    return got


def test_batch_matches_per_row_reference():
    rng = np.random.default_rng(2)
    texts = [
        "",                                   # empty: no fingerprints
        "tiny",                               # < window bytes
        "x" * (W + 2),                        # long, < guarantee positions
        " ".join(str(rng.integers(1e9)) for _ in range(40)),   # full
        "päragraph ünïcode " * 10,            # multi-byte UTF-8
        " ".join(str(rng.integers(1e9)) for _ in range(200)),  # big
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    got = _fp_sets(df)
    for i, t in enumerate(texts):
        want = {v & 0xFFFFFFFFFFFFFFFF
                for v in winnow_reference(t, window=W, guarantee=G)}
        assert got[i] == want, f"doc {i}"


def test_winnowing_guarantee_property():
    rng = np.random.default_rng(4)

    def rand_text(n):
        return "".join(chr(rng.integers(97, 123)) for _ in range(n))

    shared = rand_text(W + G - 1)  # exactly the guarantee length
    for trial in range(5):
        a = rand_text(int(rng.integers(30, 200))) + shared + rand_text(
            int(rng.integers(30, 200)))
        b = rand_text(int(rng.integers(30, 200))) + shared + rand_text(
            int(rng.integers(30, 200)))
        fa = winnow_reference(a, window=W, guarantee=G)
        fb = winnow_reference(b, window=W, guarantee=G)
        assert fa & fb, f"trial {trial}: guarantee violated"


def test_passage_pairs_pipeline(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(8)

    def rand_text(n):
        return "".join(chr(rng.integers(97, 123)) for _ in range(n))

    passage = rand_text(120)  # one long shared passage
    texts = []
    for i in range(40):
        if i in (3, 17, 29):  # plant the passage in three docs
            texts.append(rand_text(80) + passage + rand_text(80))
        else:
            texts.append(rand_text(250))
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                       "text": texts})
    ds = rd.from_pandas(df).repartition(4)
    rows = passage_pairs(ds, window=W, guarantee=G, min_shared=2).take_all()
    pairs = {(r["a"], r["b"]) for r in rows if r["a"] >= 0}
    assert pairs == {(3, 17), (3, 29), (17, 29)}
    assert all(r["n_shared"] >= 2 for r in rows if r["a"] >= 0)
    assert not any(r["a"] == -1 for r in rows)  # no hot buckets here


def test_passage_pairs_hot_bucket_marker(ray_session):
    import ray.data as rd

    # 10 identical docs with cap 4 -> truncation marker row, capped pairs
    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": ["the same exact boilerplate passage repeated verbatim "
                 "across every single document in this corpus"] * 10,
    })
    rows = passage_pairs(rd.from_pandas(df), window=W, guarantee=G,
                         min_shared=1, bucket_cap=4).take_all()
    markers = [r for r in rows if r["a"] == -1]
    assert markers and markers[0]["n_dropped"] > 0
    real = {(r["a"], r["b"]) for r in rows if r["a"] >= 0}
    assert real and all(a < 4 and b < 4 for a, b in real)


def test_empty_and_all_short_batch():
    df = pd.DataFrame({"doc_id": np.array([0, 1], dtype=np.int64),
                       "text": ["", "ab"]})
    t = pa.Table.from_pandas(df, preserve_index=False)
    out = passage_fingerprint_batch(t, window=W, guarantee=G)
    assert out["doc_id"].to_pylist() == [1]  # empty doc emits nothing
