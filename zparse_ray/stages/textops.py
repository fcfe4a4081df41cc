"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All are vectorized ``map_batches`` stages over the ``documents`` table
(columns doc_id:int64, text, lang, source, n_chars). Stateful pieces
(compiled regexes, stopword tables, n-gram profiles) live in callable
classes — built once per actor in ``__init__``, per the actor-pool
rule.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# token = word chars incl. apostrophes, or a single non-space symbol —
# a BPE-ish pre-tokenizer split (public GPT-2 pretokenizer flavor)
_BPEISH = re.compile(r"[A-Za-zÀ-ɏ]+(?:'[a-z]+)?|\d+|[^\sA-Za-zÀ-ɏ\d]")
_WS = re.compile(r"\s+")

# tiny per-language stopword/character profiles for the n-gram heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "it", "with"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "pour"},
    "es": {"el", "la", "los", "las", "y", "de", "que", "un", "una", "es"},
}


def token_count_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Whitespace token counts per row (vectorized via pandas str ops);
    matches DuckDB's regexp_split semantics used by the oracle:
    len(regexp_split(trim(text), '\\s+')), 0 for empty."""
    s = batch[column].to_pandas().fillna("")
    stripped = s.str.strip()
    n = stripped.str.split(_WS).map(len).astype("int64")
    n[stripped == ""] = 0
    return batch.append_column("n_tokens", pa.array(n.to_numpy(), pa.int64()))


class BpeishTokenCounter:
    """Actor-pool stage: regex compiled once per actor; counts BPE-ish
    pre-tokens per row."""

    def __init__(self):
        self.pat = _BPEISH

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas().fillna("")
        n = s.str.findall(self.pat).map(len).astype("int64")
        return batch.append_column("n_bpeish_tokens", pa.array(n.to_numpy(), pa.int64()))


class QualityScorer:
    """Quality signals: length, punctuation ratio, stopword ratio,
    mean word length, uppercase ratio; composite score in [0,1]."""

    def __init__(self):
        self.word = re.compile(r"[A-Za-z']+")
        self.punct = re.compile(r"[^\w\s]")
        self.stop = _LANG_PROFILES["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas().fillna("")
        length = s.str.len().astype("float64")
        n_punct = s.str.count(self.punct).astype("float64")
        words = s.str.lower().str.findall(self.word)
        n_words = words.map(len).clip(lower=1).astype("float64")
        n_stop = words.map(lambda ws: sum(1 for w in ws if w in self.stop)).astype("float64")
        punct_ratio = (n_punct / length.clip(lower=1)).to_numpy()
        stop_ratio = (n_stop / n_words).to_numpy()
        mean_wordlen = (words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)).to_numpy()
        score = np.clip(
            0.4 * np.clip(length.to_numpy() / 500.0, 0, 1)
            + 0.3 * np.clip(stop_ratio / 0.4, 0, 1)
            + 0.3 * (1.0 - np.clip(punct_ratio / 0.3, 0, 1)),
            0.0,
            1.0,
        )
        out = batch
        for name, arr in (
            ("punct_ratio", punct_ratio),
            ("stop_ratio", stop_ratio),
            ("mean_wordlen", mean_wordlen),
            ("quality_score", score),
        ):
            out = out.append_column(name, pa.array(arr, pa.float64()))
        return out


class LangId:
    """N-gram/stopword-heuristic language identifier over the tiny
    built-in profiles; emits predicted_lang per row."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
        self.word = re.compile(r"[a-zà-ÿ']+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas().fillna("").str.lower()
        words = s.str.findall(self.word)

        def best(ws) -> str:
            if not ws:
                return "unknown"
            scores = {
                lang: sum(1 for w in ws if w in prof) for lang, prof in self.profiles.items()
            }
            lang, sc = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            return lang if sc > 0 else "unknown"

        pred = words.map(best)
        return batch.append_column("predicted_lang", pa.array(pred.to_numpy(), pa.string()))


def fingerprint_batch(batch: pa.Table, column: str = "text", window: int = 16) -> pa.Table:
    """Document fingerprint: 64-bit rolling-hash (polynomial, winnowed
    min) over the text — stable content fingerprint for shingle-level
    dedup."""
    from ..functions.sketches import hash64

    s = batch[column].to_pandas().fillna("")
    # full-content stable hash + winnowed min-of-window rolling hash
    full = hash64(s.to_numpy(dtype=object))

    def rolling_min(t: str) -> int:
        if len(t) < window:
            return int(hash64(np.array([t], dtype=object))[0])
        grams = np.array([t[i : i + window] for i in range(0, len(t) - window + 1, 4)], dtype=object)
        return int(hash64(grams).min())

    wmin = s.map(rolling_min).astype("uint64")
    out = batch.append_column("content_hash", pa.array(full.astype(np.int64), pa.int64()))
    return out.append_column("fingerprint", pa.array(wmin.to_numpy().astype(np.int64), pa.int64()))


def split_assign_batch(
    batch: pa.Table,
    *,
    id_column: str = "doc_id",
    eval_pct: int = 5,
    out_column: str = "split",
) -> pa.Table:
    """Deterministic train/eval split: Knuth multiplicative hash of the
    id (mod-2^64 wrap, SQL-reproducible as HUGEINT arithmetic mod
    18446744073709551616) bucketed to 100; buckets < eval_pct are
    'eval'. Stable across runs/workers/engines — the property a
    training-data split needs (no RNG, no order dependence)."""
    ids = batch[id_column].to_numpy().astype(np.uint64)
    bucket = (ids * np.uint64(2654435761)) % np.uint64(100)
    split = np.where(bucket < eval_pct, "eval", "train")
    return batch.append_column(out_column, pa.array(split, pa.string()))
