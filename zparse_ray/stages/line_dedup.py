"""Line-level dedup (boilerplate removal): drop lines that recur across
many documents — nav menus, cookie banners, footers — the C4 /
MassiveWeb-style repeated-line filter that complements document-level
dedup (``stages/dedup.py``).

Two passes, both streaming:

1. **Count** (``boilerplate_line_hashes``): per batch, explode lines,
   normalize (strip RE2-class edge whitespace), hash64, and dedup
   (row, hash) pairs — a document is exactly one row, so per-row
   uniqueness gives an EXACT distinct-document count per line without
   any cross-batch state. The only shuffle is ``groupby(h).sum`` over
   per-batch pre-aggregated (hash, count) partials; the driver pulls
   only hashes whose doc-count >= ``min_docs`` (the boilerplate set —
   far smaller than the distinct-line universe).
2. **Rewrite** (``LineFilter`` / ``line_dedup``): the boilerplate set
   broadcasts once (``ray.put`` above 64 KiB) and is fetched per actor
   in ``__init__``; per batch, lines explode once, membership is one
   ``searchsorted`` against the sorted hash array, and kept lines
   reassemble per row with a grouped join. No shuffle.

The input Dataset is traversed twice (once per pass) — both streaming,
the same trade ``stages/scan.py::global_running_sum`` documents. At
100 TB the broadcast's documented upgrade path is a bucketed semi-join
of (doc, line-hash) against the boilerplate hashes
(``joins.bucketed_semi_mark``) when the boilerplate set outgrows
worker memory.

Empty/whitespace-only lines are never counted and never removed —
they are document structure, not boilerplate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.sketches import hash64
from .textops import arrow_text_series

_EDGE_WS = "\t\n\f\r "  # explicit RE2 whitespace class, textops parity


def _line_frame(batch: pa.Table, column: str) -> pd.DataFrame:
    """Explode a text column into one row per line: (row index in the
    batch, raw line, uint64 hash of the stripped line; hash 0 marks
    whitespace-only lines, which never count and never drop)."""
    s = arrow_text_series(batch[column])
    ex = s.str.split("\n").explode()
    norm = ex.str.strip(_EDGE_WS)
    h = np.zeros(len(ex), np.uint64)
    nz = (norm != "").to_numpy()
    if nz.any():
        h[nz] = hash64(norm.to_numpy(dtype=object)[nz])
    return pd.DataFrame({"row": ex.index.to_numpy(np.int64), "line": ex.to_numpy(dtype=object), "h": h})


def _line_count_partials(batch: pa.Table, column: str) -> pa.Table:
    lf = _line_frame(batch, column)
    lf = lf[lf["h"] != 0]
    pairs = lf[["row", "h"]].drop_duplicates()
    u, c = np.unique(pairs["h"].to_numpy(np.uint64), return_counts=True)
    return pa.table(
        {
            "h": pa.array(u.view(np.int64), pa.int64()),
            "n_docs": pa.array(c.astype(np.int64), pa.int64()),
        }
    )


def boilerplate_line_hashes(ds, column: str = "text", *, min_docs: int = 2) -> np.ndarray:
    """Sorted uint64 hashes of lines appearing in >= ``min_docs``
    distinct documents. Only the (filtered) boilerplate hashes reach
    the driver."""
    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(lambda t: _line_count_partials(t, column), batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .map_batches(
            lambda t: t.filter(pa.compute.greater_equal(t["n_docs"], min_docs)).select(["h"]),
            batch_format="pyarrow",
        )
    )
    hs = np.concatenate(
        [b["h"].to_numpy().astype(np.int64) for b in agg.iter_batches(batch_format="pyarrow")]
        or [np.zeros(0, np.int64)]
    ).view(np.uint64)
    return np.sort(hs)


class LineFilter:
    """Actor-pool ``map_batches`` callable: rewrites ``column`` with
    boilerplate lines removed and appends int64 ``n_lines_dropped``.
    ``hashes`` is a sorted uint64 array or a ``ray.ObjectRef`` to one
    (fetched once per actor; plasma numpy stays zero-copy)."""

    def __init__(self, hashes, column: str = "text"):
        import ray

        if isinstance(hashes, ray.ObjectRef):
            hashes = ray.get(hashes)
        self.hashes = np.asarray(hashes, np.uint64)
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        lf = _line_frame(batch, self.column)
        h = lf["h"].to_numpy(np.uint64)
        if len(self.hashes) == 0:
            drop = np.zeros(len(lf), bool)
        else:
            idx = np.searchsorted(self.hashes, h)
            idx_c = np.minimum(idx, len(self.hashes) - 1)
            drop = (idx < len(self.hashes)) & (self.hashes[idx_c] == h) & (h != 0)
        kept = lf[~drop]
        rebuilt = (
            kept.groupby("row")["line"].agg("\n".join)
            .reindex(range(batch.num_rows), fill_value="")
        )
        null_rows = pa.compute.is_null(batch[self.column]).to_numpy(zero_copy_only=False)
        vals = rebuilt.to_numpy(dtype=object)
        if null_rows.any():
            vals = vals.copy()
            vals[null_rows] = None
        text = pa.array(vals, pa.string())
        n_dropped = np.bincount(
            lf["row"].to_numpy(np.int64)[drop], minlength=batch.num_rows
        ).astype(np.int64)
        out = batch.set_column(
            batch.schema.get_field_index(self.column), self.column, text
        )
        return out.append_column("n_lines_dropped", pa.array(n_dropped, pa.int64()))


def line_dedup(ds, *, column: str = "text", min_docs: int = 2, concurrency: int = 2):
    """Full two-pass boilerplate removal over a Dataset. The count pass
    consumes ``ds`` once; the returned Dataset streams the rewrite."""
    import ray

    hashes = boilerplate_line_hashes(ds, column, min_docs=min_docs)
    payload = ray.put(hashes) if hashes.nbytes > (1 << 16) else hashes
    return ds.map_batches(
        LineFilter,
        fn_constructor_kwargs={"hashes": payload, "column": column},
        batch_format="pyarrow",
        concurrency=concurrency,
        max_restarts=0,
    )
