"""BPE trainer/encoder tests: merge-loop parity vs a from-scratch
reference, determinism across block layouts, encode round-trip, and
the dataset-level stage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from zparse_ray.stages.bpe import (
    BpeVocab,
    _merge_symbols,
    _word_pairs,
    bpe_token_counts,
    learn_merges,
    train_bpe,
    word_frequencies,
)
from zparse_ray.stages.textops import _BPEISH


def _reference_learn(word_counts: dict[str, int], n_merges: int,
                     min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Brute-force BPE reference: recompute ALL pair counts from
    scratch every round (no incremental index)."""
    words = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for p, occ in _word_pairs(syms).items():
                pairs[p] = pairs.get(p, 0) + occ * word_counts[w]
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        words = {w: _merge_symbols(s, best) for w, s in words.items()}
    return merges


def _wc_table(d: dict[str, int]) -> pa.Table:
    return pa.table({"word": pa.array(list(d), pa.string()),
                     "n": pa.array(list(d.values()), pa.int64())})


def test_merge_symbols_overlap_rule():
    assert _merge_symbols(list("aaa"), ("a", "a")) == ["aa", "a"]
    assert _merge_symbols(list("aaaa"), ("a", "a")) == ["aa", "aa"]
    assert _merge_symbols(list("abab"), ("a", "b")) == ["ab", "ab"]


def test_learn_merges_matches_bruteforce_reference():
    wc = {
        "lower": 5, "low": 7, "lowest": 2, "newer": 6, "new": 4,
        "wider": 3, "widest": 1, "nest": 2, "er": 9, "e": 1,
    }
    for n in (1, 5, 12, 40):
        got = learn_merges(_wc_table(wc), n)
        want = _reference_learn(wc, n)
        assert got == want, f"n_merges={n}: {got} != {want}"


def test_learn_merges_stops_below_min_pair_count():
    wc = {"ab": 1, "cd": 1}  # every pair count is 1
    assert learn_merges(_wc_table(wc), 10, min_pair_count=2) == []
    assert learn_merges(_wc_table(wc), 1, min_pair_count=1) == [("a", "b")]


def test_planted_dominant_pair_is_first_merge():
    wc = {"zq": 100, "other": 2, "words": 2}
    merges = learn_merges(_wc_table(wc), 3)
    assert merges[0] == ("z", "q")


def test_encode_word_roundtrip_and_greedy_rank_order():
    wc = {"banana": 10, "bandana": 5, "ban": 3}
    vocab = BpeVocab(merges=learn_merges(_wc_table(wc), 8))
    for w in list(wc) + ["banananana", "x", "", "nab"]:
        toks = vocab.encode_word(w)
        assert "".join(toks) == w
    # a trained word with enough merges collapses far below char count
    assert len(vocab.encode_word("banana")) < len("banana")


def test_encode_text_pretokenizes_like_the_counter():
    vocab = BpeVocab(merges=[("t", "h"), ("th", "e")])
    text = "the theme, the end"
    toks = vocab.encode_text(text)
    assert "".join(toks) == "".join(_BPEISH.findall(text))
    assert toks.count("the") == 3  # twice standalone + inside 'theme'


@pytest.fixture(scope="module")
def corpus_df():
    rng = np.random.default_rng(7)
    vocab = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dogs", "zq", "zq", "zq", "river", "stone"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(3, 30))))
             for _ in range(400)]
    texts += ["", "   ", "solo"]
    return pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})


def test_train_bpe_block_layout_invariant(ray_session, corpus_df):
    import ray.data as rd

    m1 = train_bpe(rd.from_pandas(corpus_df).repartition(1), n_merges=20)
    m4 = train_bpe(rd.from_pandas(corpus_df).repartition(5), n_merges=20)
    assert m1.merges == m4.merges
    assert len(m1.merges) > 0


def test_word_frequencies_exact_and_capped(ray_session, corpus_df):
    import ray.data as rd

    ds = rd.from_pandas(corpus_df).repartition(3)
    wc = word_frequencies(ds, max_words=5)
    assert wc.num_rows == 5
    # exact counts vs a pandas reference, and sorted by (n desc, word)
    ref = (corpus_df["text"].str.findall(_BPEISH).explode().dropna()
           .value_counts())
    got = dict(zip(wc["word"].to_pylist(), wc["n"].to_pylist()))
    for w, n in got.items():
        assert ref[w] == n
    ns = wc["n"].to_pylist()
    assert ns == sorted(ns, reverse=True)
    assert min(ns) >= sorted(ref.to_dict().values(), reverse=True)[4]


def test_bpe_token_counts_stage_matches_per_row(ray_session, corpus_df):
    import ray.data as rd

    ds = rd.from_pandas(corpus_df).repartition(3)
    vocab = train_bpe(ds, n_merges=30)
    out = (bpe_token_counts(ds, vocab, concurrency=2)
           .select_columns(["doc_id", "bpe_token_count"]).take_all())
    got = {r["doc_id"]: r["bpe_token_count"] for r in out}
    for _, row in corpus_df.iterrows():
        want = sum(len(vocab.encode_word(w))
                   for w in _BPEISH.findall(row["text"]))
        assert got[row["doc_id"]] == want
    assert got[corpus_df.index[-3]] == 0  # empty text row


def test_train_bpe_raises_on_empty_corpus(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": ["", "  "]}))
    with pytest.raises(ValueError, match="no words"):
        train_bpe(ds, n_merges=5)


def test_vocab_save_load_roundtrip(tmp_path):
    vocab = BpeVocab(merges=[("t", "h"), ("th", "e"), ("a", "n")])
    path = str(tmp_path / "vocab.json")
    vocab.save(path)
    back = BpeVocab.load(path)
    assert back.merges == vocab.merges
    assert back.encode_word("then") == vocab.encode_word("then")
    import pytest as _pytest
    (tmp_path / "bad.json").write_text('{"merges": []}')
    with _pytest.raises(ValueError, match="not a zparse_ray BPE vocab"):
        BpeVocab.load(str(tmp_path / "bad.json"))


def test_learn_merges_never_emits_duplicates():
    """A later merge can recreate an emitted pair's adjacency and the
    delta bookkeeping re-adds it to pair_counts; selection must skip it
    (ADVICE r4). Small-alphabet random corpora with heavy repetition
    exercise symbol-concatenation collisions far more than real text."""
    import numpy as np

    rng = np.random.default_rng(17)
    for trial in range(8):
        words = {}
        for _ in range(60):
            w = "".join(rng.choice(list("aab"), rng.integers(2, 9)))
            words[w] = words.get(w, 0) + int(rng.integers(1, 20))
        merges = learn_merges(_wc_table(words), 60, min_pair_count=1)
        assert len(merges) == len(set(merges)), (trial, merges)


def test_ranks_keeps_first_occurrence_for_duplicate_merges():
    from zparse_ray.stages.bpe import BpeVocab

    v = BpeVocab(merges=[("a", "b"), ("c", "d"), ("a", "b")])
    assert v.ranks()[("a", "b")] == 0
