"""D3-D5: column-stats kernels over generic Arrow tables.

Partial/merge/finalize shape: each block contributes a small partial
(null counts, min/max/sum/count per column, HLL registers, t-digest
centroids); partials merge associatively at the driver or in a tiny
aggregation stage. A bare ``groupby().aggregate()`` over raw rows is
reserved for keyed aggregates — whole-column stats never shuffle the
data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import HyperLogLog, TDigest


def column_stats_partial(batch: pa.Table, columns: list[str]) -> dict:
    """Per-block partial: nulls / count / min / max / sum per column."""
    out = {}
    for c in columns:
        col = batch[c]
        nulls = col.null_count
        stats = {"count": len(col), "nulls": nulls}
        if pa.types.is_floating(col.type) or pa.types.is_integer(col.type):
            if len(col) > nulls:
                stats["min"] = pc.min(col).as_py()
                stats["max"] = pc.max(col).as_py()
                stats["sum"] = pc.sum(col).as_py()
            else:
                stats["min"] = stats["max"] = None
                stats["sum"] = 0
        out[c] = stats
    return out


def merge_column_stats(a: dict, b: dict) -> dict:
    out = {}
    for c in set(a) | set(b):
        if c not in a:
            out[c] = b[c]
            continue
        if c not in b:
            out[c] = a[c]
            continue
        sa, sb = a[c], b[c]
        m: dict = {"count": sa["count"] + sb["count"], "nulls": sa["nulls"] + sb["nulls"]}
        if "sum" in sa:
            mins = [x for x in (sa.get("min"), sb.get("min")) if x is not None]
            maxs = [x for x in (sa.get("max"), sb.get("max")) if x is not None]
            m["min"] = min(mins) if mins else None
            m["max"] = max(maxs) if maxs else None
            m["sum"] = sa["sum"] + sb["sum"]
        out[c] = m
    return out


class HllPartial:
    """map_batches stage: one serialized HLL per batch per column."""

    def __init__(self, columns: list[str], p: int = 14):
        self.columns = columns
        self.p = p

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for c in self.columns:
            h = HyperLogLog(self.p)
            arr = batch[c].to_numpy(zero_copy_only=False)
            arr = arr[~(arr == None)]  # noqa: E711 — object-array null mask
            if len(arr):
                if arr.dtype.kind not in ("i", "u"):
                    arr = arr.astype(object)
                h.add(arr)
            rows.append({"column": c, "hll": h.to_bytes()})
        return pa.Table.from_pylist(rows)


def merge_hlls(rows: list[dict]) -> dict[str, float]:
    merged: dict[str, HyperLogLog] = {}
    for r in rows:
        h = HyperLogLog.from_bytes(r["hll"])
        merged[r["column"]] = merged[r["column"]].merge(h) if r["column"] in merged else h
    return {c: h.estimate() for c, h in merged.items()}


class TDigestPartial:
    """map_batches stage: one serialized t-digest per batch per column."""

    def __init__(self, columns: list[str], compression: int = 200):
        self.columns = columns
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for c in self.columns:
            d = TDigest(self.compression)
            d.add(batch[c].to_numpy(zero_copy_only=False).astype(np.float64))
            rows.append({"column": c, "tdigest": d.to_bytes()})
        return pa.Table.from_pylist(rows)


def merge_tdigests(rows: list[dict]) -> dict[str, TDigest]:
    merged: dict[str, TDigest] = {}
    for r in rows:
        d = TDigest.from_bytes(r["tdigest"])
        merged[r["column"]] = merged[r["column"]].merge(d) if r["column"] in merged else d
    return merged
