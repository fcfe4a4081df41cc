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


# ---------------------------------------------------------------------------
# Exact distributed quantiles (D4's exact complement)


def _sel_mask(v: np.ndarray, lo: float, hi: float, closed: bool) -> np.ndarray:
    """Membership mask for a candidate interval: [lo, hi) half-open, or
    [lo, hi] when the interval inherits the global-max closed edge."""
    return (v >= lo) & ((v < hi) | (closed & (v <= hi)))


def _hist_pass(ds, column: str, intervals: list[tuple[float, float, bool]], n_bins: int):
    """One map_batches pass: per-block histograms for every active
    interval at once (n_intervals x n_bins ints per block — tiny).
    Values are pre-filtered to the interval with its exact closedness so
    np.histogram's closed-last-bin quirk can't count v == hi into a
    half-open interval."""
    edges = [np.linspace(lo, hi, n_bins + 1) for lo, hi, _ in intervals]

    def hist(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        rows = []
        for qi, ((lo, hi, closed), e) in enumerate(zip(intervals, edges)):
            sel = v[_sel_mask(v, lo, hi, closed)]
            counts, _ = np.histogram(sel, bins=e)
            # local data min/max let the driver SNAP the next interval to
            # the actual value range — without it, a bin whose values
            # concentrate at one point narrows by only n_bins x in WIDTH
            # per pass and can take hundreds of passes to isolate them
            rows.append(
                {
                    "qi": qi,
                    "counts": counts.astype(np.int64),
                    "lmin": float(sel.min()) if len(sel) else np.inf,
                    "lmax": float(sel.max()) if len(sel) else -np.inf,
                }
            )
        return pa.Table.from_pylist(rows)

    merged = [np.zeros(n_bins, dtype=np.int64) for _ in intervals]
    lmins = [np.inf] * len(intervals)
    lmaxs = [-np.inf] * len(intervals)
    for b in ds.map_batches(hist, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            qi = r["qi"]
            merged[qi] += np.asarray(r["counts"], dtype=np.int64)
            lmins[qi] = min(lmins[qi], r["lmin"])
            lmaxs[qi] = max(lmaxs[qi], r["lmax"])
    return merged, edges, lmins, lmaxs


def exact_quantiles(
    ds,
    column: str,
    qs: list[float],
    *,
    n_bins: int = 1024,
    max_collect: int = 1_000_000,
) -> dict[float, float]:
    """Exact quantiles without materializing the column: iterative
    histogram narrowing (each pass shrinks every quantile's candidate
    interval by n_bins x) until the interval holds <= max_collect values,
    then one filtered collect + rank select. O(log_bins(n)) passes over
    the data, O(n_bins * len(qs)) driver state — scales to arbitrarily
    large columns, unlike a global sort.

    Rank convention matches DuckDB's quantile_disc: 0-based index
    ceil(q*n) - 1 of the ascending-sorted column (nulls/NaN dropped).
    """
    import math

    def cmm(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pa.Table.from_pylist([])
        return pa.Table.from_pylist(
            [{"n": len(v), "lo": float(v.min()), "hi": float(v.max())}]
        )

    n, glo, ghi = 0, math.inf, -math.inf
    for b in ds.map_batches(cmm, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            n += r["n"]
            glo, ghi = min(glo, r["lo"]), max(ghi, r["hi"])
    if n == 0:
        return {q: float("nan") for q in qs}

    # state per quantile: interval [lo, hi] (closed flag), rank within
    # it (0-based), count inside it
    state = {q: [glo, ghi, True, max(0, math.ceil(q * n) - 1), n] for q in qs}
    out: dict[float, float] = {}

    iters = 0
    while True:
        active = [q for q in qs if q not in out and state[q][4] > max_collect]
        if not active or iters >= 64:
            # 64-pass cap: pathological spacing falls through to the
            # collect phase (correct, just memory-heavier)
            break
        iters += 1
        intervals = [(state[q][0], state[q][1], state[q][2]) for q in active]
        merged, edges, lmins, lmaxs = _hist_pass(ds, column, intervals, n_bins)
        for qi, q in enumerate(active):
            lo, hi, closed, r, _ = state[q]
            counts, e = merged[qi], edges[qi]
            if lmins[qi] >= lmaxs[qi]:
                # the interval holds exactly one distinct value
                out[q] = lmins[qi]
                continue
            if hi <= lo or (hi - lo) < 1e-300:
                out[q] = lo
                continue
            cum = np.cumsum(counts)
            j = int(np.searchsorted(cum, r + 1))
            before = int(cum[j - 1]) if j > 0 else 0
            nlo, nhi = float(e[j]), float(e[j + 1])
            if nhi <= nlo:
                out[q] = nlo
                continue
            nclosed = closed and j == n_bins - 1
            # SNAP to the actual data range: values in bin j all lie in
            # [max(nlo, lmin), min(nhi-, lmax)], so intersecting keeps
            # the same value set while collapsing empty width — this is
            # what bounds the pass count when values concentrate
            if lmins[qi] > nlo:
                nlo = lmins[qi]
            if lmaxs[qi] < nhi:
                nhi = lmaxs[qi]
                nclosed = True  # lmax is attained, keep it inside
            state[q] = [nlo, nhi, nclosed, r - before, int(counts[j])]

    rest = [q for q in qs if q not in out]
    if rest:
        ivs = [(state[q][0], state[q][1], state[q][2]) for q in rest]

        def collect(batch: pa.Table) -> pa.Table:
            v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            rows = []
            for qi, (lo, hi, closed) in enumerate(ivs):
                sel = v[_sel_mask(v, lo, hi, closed)]
                if len(sel):
                    rows.append({"qi": qi, "vals": sel})
            if not rows:
                return pa.table(
                    {"qi": pa.array([], pa.int64()),
                     "vals": pa.array([], pa.list_(pa.float64()))}
                )
            return pa.Table.from_pylist(rows)

        pools: dict[int, list] = {i: [] for i in range(len(rest))}
        for b in ds.map_batches(collect, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            for r in b.to_pylist():
                pools[r["qi"]].append(np.asarray(r["vals"], dtype=np.float64))
        for qi, q in enumerate(rest):
            vals = np.sort(np.concatenate(pools[qi])) if pools[qi] else np.array([state[q][0]])
            out[q] = float(vals[min(state[q][3], len(vals) - 1)])
    return out
