"""Sequence-packing tests: token conservation, coverage, the two
modes' invariants, oversize/empty handling, and a dataset-level drive."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from zparse_ray.stages.pack import pack_batch, pack_sequences

S = 64  # small seq budget so tests exercise many sequences


def _mk(texts, ids=None):
    ids = np.arange(len(texts), dtype=np.int64) if ids is None else np.asarray(ids)
    return pa.Table.from_pandas(
        pd.DataFrame({"doc_id": ids, "text": texts}), preserve_index=False
    )


def _rand_docs(rng, n, lo=3, hi=40):
    return [
        " ".join(str(rng.integers(10**6)) for _ in range(int(rng.integers(lo, hi))))
        for _ in range(n)
    ]


def _ntok(s):
    return len(s.split())


def test_split_mode_token_conservation_and_exact_cuts():
    rng = np.random.default_rng(1)
    texts = _rand_docs(rng, 50)
    out = pack_batch(_mk(texts), seq_tokens=S, mode="split")
    total = sum(_ntok(t) for t in texts)
    n_tok = out["n_tokens"].to_pylist()
    assert sum(n_tok) == total  # zero token loss
    assert all(v == S for v in n_tok[:-1])  # every cut exact but the last
    assert all(p == 0 for p in out["pad_tokens"].to_pylist()[:-1])
    # the packed token stream IS the concatenated input token stream
    packed = " ".join(out["text"].to_pylist()).split()
    source = " ".join(texts).split()
    assert packed == source


def test_split_mode_provenance_ranges():
    texts = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota"]
    out = pack_batch(_mk(texts), seq_tokens=4, mode="split")
    # 9 tokens -> seqs of 4/4/1; seq0 covers docs 0-1, seq1 docs 1-2, seq2 doc 2
    assert out["doc_ids"].to_pylist() == [[0, 1], [1, 2], [2]]
    assert out["n_docs"].to_pylist() == [2, 2, 1]


def test_whole_mode_invariants():
    rng = np.random.default_rng(2)
    texts = _rand_docs(rng, 80)
    t = _mk(texts)
    out = pack_batch(t, seq_tokens=S, mode="whole")
    n_tok = out["n_tokens"].to_pylist()
    lists = out["doc_ids"].to_pylist()
    # budget respected, padding accounted
    assert all(v <= S for v in n_tok)
    assert out["pad_tokens"].to_pylist() == [S - v for v in n_tok]
    # every doc appears exactly once, in input order, contiguous ranges
    flat = [d for l in lists for d in l]
    assert flat == list(range(len(texts)))
    # each sequence's count is the exact member sum
    for l, v in zip(lists, n_tok):
        assert v == sum(_ntok(texts[d]) for d in l)
    # the REAL next-fit guarantee is pairwise (ADVICE r4): consecutive
    # sequences together exceed the budget (>= 50% average utilization);
    # an individual non-final sequence may legitimately be under half
    assert all(a + b > S for a, b in zip(n_tok, n_tok[1:]))
    # documents intact in the packed text
    for l, txt in zip(lists, out["text"].to_pylist()):
        assert txt == " ".join(texts[d] for d in l)


def test_whole_mode_under_half_nonfinal_sequence_is_legal():
    """The ADVICE r4 counterexample pinned: docs of 20 then 50 tokens at
    budget 64 yield a 20-token NON-final sequence — next-fit only
    guarantees the pairwise bound, and the packer must not be 'fixed'
    to avoid this (reordering would break contiguous provenance)."""
    texts = ["x " * 20, "y " * 50]
    out = pack_batch(_mk(texts), seq_tokens=S, mode="whole")
    n_tok = out["n_tokens"].to_pylist()
    assert n_tok == [20, 50]
    assert n_tok[0] * 2 <= S  # under half full, and not the last
    assert n_tok[0] + n_tok[1] > S  # the real bound still holds


def test_whole_mode_oversize_raises():
    texts = ["x " * (S + 5), "short doc"]
    with pytest.raises(ValueError, match="exceed seq_tokens"):
        pack_batch(_mk(texts), seq_tokens=S, mode="whole")


def test_empty_and_ws_only_rows_dropped():
    texts = ["", "   ", "one two three", None]
    out = pack_batch(_mk(texts), seq_tokens=S, mode="whole")
    assert out["doc_ids"].to_pylist() == [[2]]
    assert out["n_tokens"].to_pylist() == [3]
    empty = pack_batch(_mk(["", "  "]), seq_tokens=S, mode="split")
    assert empty.num_rows == 0


def test_unicode_whitespace_parity_with_chunker():
    # NBSP is NOT a separator for the byte-level tokenizer: 'a\xa0b' is
    # one token for both the counter and the cutter (no drift between
    # whole-mode accounting and split-mode cuts)
    texts = ["a\xa0b c", "d e f"]
    whole = pack_batch(_mk(texts), seq_tokens=3, mode="whole")
    assert whole["n_tokens"].to_pylist() == [2, 3]
    split = pack_batch(_mk(texts), seq_tokens=3, mode="split")
    assert sum(split["n_tokens"].to_pylist()) == 5


def test_determinism():
    rng = np.random.default_rng(3)
    texts = _rand_docs(rng, 30)
    a = pack_batch(_mk(texts), seq_tokens=S, mode="split")
    b = pack_batch(_mk(texts), seq_tokens=S, mode="split")
    assert a.equals(b)


def test_dataset_level_pack(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(4)
    texts = _rand_docs(rng, 200)
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    ds = rd.from_pandas(df).repartition(4)
    out = pack_sequences(ds, seq_tokens=S, mode="whole").take_all()
    flat = sorted(d for r in out for d in r["doc_ids"])
    assert flat == list(range(200))  # exactly-once coverage across blocks
    assert all(r["n_tokens"] <= S for r in out)
    # the pairwise next-fit bound, checked per block (ADVICE r4):
    # seq_in_batch resets to 0 at each block boundary, so consecutive
    # rows with increasing seq_in_batch belong to the same block and
    # must jointly exceed the budget
    for prev, cur in zip(out, out[1:]):
        if cur["seq_in_batch"] == prev["seq_in_batch"] + 1:
            assert prev["n_tokens"] + cur["n_tokens"] > S
