"""Distributed BPE (byte-pair-encoding) tokenizer training + application.

Scale shape — how real subword trainers run at corpus scale (the
sentencepiece / subword-nmt split of work):

- the CORPUS-sized work is word-frequency counting: one vectorized
  pre-tokenize + per-batch ``np.unique`` partial per block, then ONE
  ``groupby(word).sum`` shuffle of pre-aggregated ``(word, count)``
  rows — the shuffle moves O(distinct words per block), never
  O(tokens), and the text column never shuffles;
- the MERGE LOOP runs on the driver over the capped ``(word, count)``
  table: O(unique-words × merges) with an inverted pair→word index so
  each merge touches only the words containing the merged pair — cost
  is bounded by ``max_words`` (top-by-count vocabulary cap), fully
  independent of corpus size;
- APPLICATION is an actor-pool ``map_batches`` stage: merge ranks are
  ``ray.put`` once and fetched per actor, each batch encodes only its
  UNIQUE words (``np.unique(return_inverse)`` + a per-actor dict
  memo — Zipfian word distributions make the hit rate high) and maps
  per-word token counts back through the inverse indices; per-doc sums
  are one ``np.bincount``. Python-level work is O(new unique words per
  batch), not O(tokens).

Determinism: no RNG anywhere; pair ties break on (count desc, pair
lexicographic asc) and the word-frequency table is exact, so the same
corpus yields the same merge list regardless of block layout, worker
count or engine — the property every other keyed op in this repo
already guarantees (see ``sample.deterministic_shuffle``).

Pre-tokenization reuses the BPE-ish GPT-2-flavor regex from
``textops`` (public-knowledge pattern), case-sensitive as BPE vocabs
conventionally are. Tokens are plain substrings of the word (no
end-of-word marker), so ``"".join(encode_word(w)) == w`` holds exactly
— the round-trip invariant the tests pin.

Reference parity note: zParse has no tokenizer; this operator belongs
to the training-data surface this engine adds beyond the reference
(SURVEY §2.4e).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from .textops import _BPEISH
from .textops import arrow_text_series


# ---------------------------------------------------------------- train

def _word_count_partial(batch: pa.Table, column: str) -> pa.Table:
    """Per-batch pre-aggregated (word, n) partial counts."""
    s = arrow_text_series(batch[column])
    words = s.str.findall(_BPEISH).explode().dropna()
    if len(words) == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    u, c = np.unique(words.to_numpy(dtype=object), return_counts=True)
    return pa.table({"word": pa.array(u, pa.string()),
                     "n": pa.array(c.astype(np.int64), pa.int64())})


def word_frequencies(ds, column: str = "text", *, min_count: int = 1,
                     max_words: int = 50_000) -> pa.Table:
    """Exact corpus word-frequency table, capped to the ``max_words``
    most frequent (ties broken by word asc for block-layout-invariant
    vocabularies). One (word, count) shuffle; the sort/limit runs over
    the distinct-word table, not the corpus. Returns an Arrow table
    (word, n) sorted by (n desc, word asc)."""
    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(lambda t: _word_count_partial(t, column),
                       batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )
    if min_count > 1:
        agg = agg.filter(expr=f"n >= {int(min_count)}")
    top = agg.sort(["n", "word"], descending=[True, False]).limit(max_words)
    rows = pa.Table.from_pylist(top.take_all())
    if rows.num_rows == 0 or "word" not in rows.column_names:
        raise ValueError("word_frequencies: corpus has no words — cannot train")
    return rows.select(["word", "n"])


def _word_pairs(symbols: list[str]) -> dict[tuple[str, str], int]:
    """Occurrence counts of adjacent symbol pairs within one word."""
    out: dict[tuple[str, str], int] = {}
    for a, b in zip(symbols, symbols[1:]):
        out[(a, b)] = out.get((a, b), 0) + 1
    return out


def _merge_symbols(symbols: list[str], pair: tuple[str, str]) -> list[str]:
    """Merge every non-overlapping occurrence of ``pair``, leftmost
    first (the standard BPE overlap rule: 'aaa' + (a,a) -> ['aa','a'])."""
    a, b = pair
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def learn_merges(word_counts: pa.Table, n_merges: int,
                 *, min_pair_count: int = 2) -> list[tuple[str, str]]:
    """The driver-side merge loop over the capped (word, n) table.

    Incremental pair bookkeeping (an inverted pair -> affected-word-ids
    index, the subword-nmt ``learn_bpe`` structure): each merge
    re-derives pair contributions only for the words that contain the
    merged pair. Stops early when no pair reaches ``min_pair_count``.
    Deterministic: ties on count break to the lexicographically
    smallest pair."""
    words = [list(w) for w in word_counts["word"].to_pylist()]
    counts = word_counts["n"].to_numpy().astype(np.int64)

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        for p, occ in _word_pairs(syms).items():
            pair_counts[p] = pair_counts.get(p, 0) + occ * int(counts[i])
            where.setdefault(p, set()).add(i)

    merges: list[tuple[str, str]] = []
    emitted: set[tuple[str, str]] = set()
    while len(merges) < n_merges:
        # a later merge can recreate an already-emitted pair's adjacency
        # (a merged symbol concatenating to equal one of its sides) and
        # the delta bookkeeping re-adds it; emitting it twice would let
        # ranks() shift the merge to its LAST rank and desync the
        # encoder from the trainer (ADVICE r4) — drop such re-entries
        best = None
        while pair_counts:
            cand = min(pair_counts, key=lambda p: (-pair_counts[p], p))
            if pair_counts[cand] < min_pair_count:
                break
            if cand in emitted:
                pair_counts.pop(cand, None)
                where.pop(cand, None)
                continue
            best = cand
            break
        if best is None:
            break
        merges.append(best)
        emitted.add(best)
        for i in sorted(where.get(best, ())):
            old = _word_pairs(words[i])
            words[i] = _merge_symbols(words[i], best)
            new = _word_pairs(words[i])
            for p in old.keys() | new.keys():
                delta = (new.get(p, 0) - old.get(p, 0)) * int(counts[i])
                if delta:
                    c = pair_counts.get(p, 0) + delta
                    if c > 0:
                        pair_counts[p] = c
                        where.setdefault(p, set()).add(i)
                    else:
                        pair_counts.pop(p, None)
                if new.get(p, 0) == 0:
                    s = where.get(p)
                    if s is not None:
                        s.discard(i)
                        if not s:
                            del where[p]
        pair_counts.pop(best, None)
        where.pop(best, None)
    return merges


@dataclass
class BpeVocab:
    """Learned merge list + derived ranks. Small (O(n_merges)) —
    broadcast via ``ray.put`` and rebuilt per actor; persistable as
    one JSON artifact (the tokenizer file a training run ships)."""

    merges: list = field(default_factory=list)

    def save(self, path: str) -> None:
        import json

        with open(path, "w") as f:
            json.dump({"format": "zparse_ray-bpe-v1",
                       "merges": [list(p) for p in self.merges]}, f)

    @classmethod
    def load(cls, path: str) -> "BpeVocab":
        import json

        with open(path) as f:
            d = json.load(f)
        if d.get("format") != "zparse_ray-bpe-v1":
            raise ValueError(f"not a zparse_ray BPE vocab file: {path}")
        return cls(merges=[tuple(p) for p in d["merges"]])

    def ranks(self) -> dict[tuple[str, str], int]:
        # first occurrence wins defensively: learn_merges never emits a
        # pair twice, but a hand-built/deserialized merge list might,
        # and the trainer applied such a pair at its FIRST rank
        out: dict[tuple[str, str], int] = {}
        for r, p in enumerate(self.merges):
            out.setdefault(tuple(p), r)
        return out

    def encode_word(self, word: str,
                    _ranks: dict | None = None) -> list[str]:
        """Standard BPE encode: greedily merge the lowest-rank adjacent
        pair until none applies."""
        ranks = self.ranks() if _ranks is None else _ranks
        syms = list(word)
        while len(syms) > 1:
            pairs = set(zip(syms, syms[1:]))
            cand = [p for p in pairs if p in ranks]
            if not cand:
                break
            syms = _merge_symbols(syms, min(cand, key=ranks.__getitem__))
        return syms

    def encode_text(self, text: str) -> list[str]:
        """Pre-tokenize then encode each word (test/debug surface)."""
        ranks = self.ranks()
        out: list[str] = []
        for w in _BPEISH.findall(text):
            out.extend(self.encode_word(w, ranks))
        return out


def train_bpe(ds, column: str = "text", *, n_merges: int = 200,
              max_words: int = 50_000, min_count: int = 1,
              min_pair_count: int = 2) -> BpeVocab:
    """End-to-end trainer: distributed word counting (one shuffle) +
    driver merge loop bounded by ``max_words``."""
    wc = word_frequencies(ds, column, min_count=min_count,
                          max_words=max_words)
    return BpeVocab(merges=learn_merges(wc, n_merges,
                                        min_pair_count=min_pair_count))


# ---------------------------------------------------------------- apply

class BpeEncoder:
    """Actor-pool ``map_batches`` callable: appends ``bpe_token_count``
    (int64, 0 for empty/null text). ``vocab`` is a ``BpeVocab`` or a
    ``ray.ObjectRef`` to one — fetched ONCE per actor. The per-actor
    ``_memo`` dict caches word -> token count across batches, so the
    Python-level encode loop runs only on words this actor has never
    seen (Zipf: the head of the distribution is cached after the first
    batch)."""

    def __init__(self, vocab, text_col: str = "text"):
        import ray

        if isinstance(vocab, ray.ObjectRef):
            vocab = ray.get(vocab)
        self.vocab = vocab
        self.ranks = vocab.ranks()
        self.text_col = text_col
        self._memo: dict[str, int] = {}

    def _count_word(self, w: str) -> int:
        n = self._memo.get(w)
        if n is None:
            n = len(self.vocab.encode_word(w, self.ranks))
            self._memo[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = arrow_text_series(batch[self.text_col])
        words = s.str.findall(_BPEISH)
        n_per_row = words.str.len().to_numpy().astype(np.int64)
        out = np.zeros(batch.num_rows, np.int64)
        flat = words.explode().dropna().to_numpy(dtype=object)
        if len(flat):
            uniq, inv = np.unique(flat, return_inverse=True)
            per_uniq = np.fromiter((self._count_word(w) for w in uniq),
                                   np.int64, len(uniq))
            per_occ = per_uniq[inv]
            rows = np.repeat(np.arange(batch.num_rows), n_per_row)
            out = np.bincount(rows, weights=per_occ,
                              minlength=batch.num_rows).astype(np.int64)
        return batch.append_column("bpe_token_count",
                                   pa.array(out, pa.int64()))


def bpe_token_counts(ds, vocab: BpeVocab, *, concurrency: int = 2, **kwargs):
    """Dataset-level wrapper: broadcast the vocab once, stream the
    encoding stage."""
    import ray

    ref = ray.put(vocab)
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"vocab": ref, **kwargs},
        batch_format="pyarrow",
        concurrency=concurrency,
        max_restarts=0,
    )
