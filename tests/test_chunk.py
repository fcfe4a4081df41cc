"""Token-window chunking (stages/chunk.py) vs a per-row regex
reference, plus coverage/overlap properties and UTF-8 safety."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest

from zparse_ray.stages.chunk import chunk_documents, chunk_documents_batch

_TOK = re.compile(r"[^\t\n\f\r ]+")  # the RE2 whitespace class textops uses


def _reference_chunks(text, chunk_tokens, overlap):
    """Per-row reference: regex token spans, slice from first token
    start to last token end."""
    if text is None:
        return []
    spans = [m.span() for m in _TOK.finditer(text)]
    if not spans:
        return []
    stride = chunk_tokens - overlap
    out = []
    i = 0
    while True:
        lo = i * stride
        hi = min(lo + chunk_tokens, len(spans))
        out.append((i, text[spans[lo][0] : spans[hi - 1][1]], hi - lo))
        if hi == len(spans):
            return out
        i += 1


def _batch(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


CORPUS = [
    "the quick brown fox jumps over the lazy dog and keeps on running far away",
    "one",
    "",
    None,
    "   \t\n  ",  # whitespace-only -> no chunks
    "naïve café über déjà-vu — ünïcödé tokens everywhere mañana",  # multi-byte
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "x" * 500,  # one giant token
    "tab\tsep\nnewline\fformfeed\rcarriage mix   of puzzling\t\twhitespace",
]


@pytest.mark.parametrize("chunk,overlap", [(5, 0), (5, 2), (8, 3), (3, 1), (1, 0)])
def test_chunk_batch_matches_per_row_reference(chunk, overlap):
    got = chunk_documents_batch(
        _batch(CORPUS), chunk_tokens=chunk, overlap_tokens=overlap
    )
    by_doc = {}
    for did, cid, txt, ntok in zip(
        got["doc_id"].to_pylist(),
        got["chunk_id"].to_pylist(),
        got["text"].to_pylist(),
        got["n_tokens"].to_pylist(),
    ):
        by_doc.setdefault(did, []).append((cid, txt, ntok))
    for i, text in enumerate(CORPUS):
        assert by_doc.get(i, []) == _reference_chunks(text, chunk, overlap), (
            f"doc {i} chunk={chunk} overlap={overlap}"
        )


def test_chunk_nonoverlapping_covers_all_tokens():
    text = " ".join(f"w{i}" for i in range(997))
    got = chunk_documents_batch(_batch([text]), chunk_tokens=100)
    rebuilt = [t for c in got["text"].to_pylist() for t in c.split()]
    assert rebuilt == text.split()
    assert got["n_tokens"].to_pylist() == [100] * 9 + [97]


def test_chunk_overlap_repeats_tail_tokens():
    text = " ".join(f"w{i}" for i in range(10))
    got = chunk_documents_batch(_batch([text]), chunk_tokens=6, overlap_tokens=2)
    chunks = [c.split() for c in got["text"].to_pylist()]
    assert chunks[0] == [f"w{i}" for i in range(6)]
    assert chunks[1][:2] == ["w4", "w5"]  # overlap tokens repeat
    assert chunks[-1][-1] == "w9"


def test_chunk_validation_errors():
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents_batch(_batch(["a"]), chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap_tokens"):
        chunk_documents_batch(_batch(["a"]), chunk_tokens=4, overlap_tokens=4)


def test_chunk_documents_dataset_streams(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = chunk_documents(docs, chunk_tokens=32, overlap_tokens=4).to_pandas()
    n_docs = docs.count()
    assert len(out) >= n_docs  # 1->N explode
    assert (out["n_tokens"] <= 32).all() and (out["n_tokens"] > 0).all()
    # chunk_ids are dense per doc
    assert (out.groupby("doc_id")["chunk_id"].max() + 1).equals(
        out.groupby("doc_id")["chunk_id"].count()
    )
    # every chunk is a substring of its source doc
    import pyarrow.parquet as pq

    tab = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    src = dict(zip(tab["doc_id"].to_pylist(), tab["text"].to_pylist()))
    sample = out.sample(n=min(50, len(out)), random_state=0)
    assert all(row.text in src[row.doc_id] for row in sample.itertuples())
