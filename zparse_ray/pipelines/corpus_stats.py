"""One-stop corpus profile: the report a curation run consults before
deciding its cleaning/sampling/dedup recipe.

Scale shape: ONE streaming scan computes per-batch partials — doc and
token counts, per-language tallies, byte-length extrema/sums, an HLL
sketch over normalized content hashes (the exact-dedup key, so the
distinct estimate IS the post-exact-dedup size to within HLL error) —
folded on the driver at O(langs + HLL registers) memory; token-length
quantiles then run through the exact histogram-narrowing operator
(O(log n) additional narrow-column passes, never a materialized
column). Nothing ever shuffles; output is one small JSON-able dict.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.sketches import HyperLogLog
from ..stages.dedup import content_hash_batch
from ..stages.stats import exact_quantiles
from ..stages.textops import token_count_batch


def _partial(batch: pa.Table, *, text_column: str, lang_column: str | None) -> pa.Table:
    withtok = token_count_batch(batch, text_column)
    ntok = withtok["n_tokens"].to_numpy()
    h = content_hash_batch(batch, text_column)["content_hash"].to_numpy()
    hll = HyperLogLog()
    hll.add_hashes(h.view(np.uint64))  # content hashes are already mixed 64-bit
    nbytes = pa.compute.binary_length(
        pa.compute.fill_null(batch[text_column], "")
    ).to_numpy(zero_copy_only=False)
    if lang_column is not None and lang_column in batch.column_names:
        raw = batch[lang_column].to_numpy(zero_copy_only=False)
        mask = np.array([v is not None for v in raw])
        langs, counts = np.unique(raw[mask].astype(str), return_counts=True)
        n_null_lang = int((~mask).sum())
    else:
        langs, counts = np.array([], dtype=str), np.array([], dtype=np.int64)
        n_null_lang = 0
    return pa.table(
        {
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "n_tokens": pa.array([int(ntok.sum())], pa.int64()),
            "n_bytes": pa.array([int(nbytes.sum())], pa.int64()),
            "n_null_lang": pa.array([n_null_lang], pa.int64()),
            "hll": pa.array([hll.to_bytes()], pa.binary()),
            "langs": pa.array([list(langs)], pa.list_(pa.string())),
            "lang_counts": pa.array([[int(c) for c in counts]], pa.list_(pa.int64())),
        }
    )


def corpus_stats(
    ds,
    *,
    text_column: str = "text",
    lang_column: str | None = "lang",
    quantiles: tuple[float, ...] = (0.1, 0.5, 0.9, 0.99),
) -> dict:
    """Profile a documents dataset; returns a JSON-able dict. The
    input is projected down to the profiled columns first — both the
    column-pruning rule AND a correctness guard: an input that already
    carries an ``n_tokens``/``content_hash`` column (e.g. the chunk
    pipeline's own output) would otherwise collide with the helper
    columns the profiling stages append."""
    names = ds.schema().names
    if text_column not in names:
        raise ValueError(f"corpus_stats: no {text_column!r} column in input")
    keep = [text_column]
    if lang_column is not None and lang_column in names:
        keep.append(lang_column)
    else:
        lang_column = None
    ds = ds.select_columns(keep)
    partials = ds.map_batches(
        _partial,
        fn_kwargs={"text_column": text_column, "lang_column": lang_column},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    n_docs = n_tokens = n_bytes = n_null_lang = 0
    hll = HyperLogLog()
    lang_tally: dict[str, int] = {}
    for part in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        for row in part.to_pylist():
            n_docs += row["n_docs"]
            n_tokens += row["n_tokens"]
            n_bytes += row["n_bytes"]
            n_null_lang += row["n_null_lang"]
            hll = hll.merge(HyperLogLog.from_bytes(row["hll"]))
            for lang, c in zip(row["langs"], row["lang_counts"]):
                lang_tally[lang] = lang_tally.get(lang, 0) + c
    stats = {
        "n_docs": int(n_docs),
        "n_tokens": int(n_tokens),
        "n_bytes": int(n_bytes),
        "mean_tokens_per_doc": (n_tokens / n_docs) if n_docs else 0.0,
        "distinct_content_est": int(round(hll.estimate())),
        "by_lang": dict(sorted(lang_tally.items())),
        "n_null_lang": int(n_null_lang),
    }
    if n_docs and quantiles:
        withtok = ds.map_batches(
            token_count_batch,
            fn_kwargs={"column": text_column},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        qs = exact_quantiles(withtok, "n_tokens", list(quantiles))
        stats["token_quantiles"] = {str(q): float(v) for q, v in sorted(qs.items())}
    return stats
