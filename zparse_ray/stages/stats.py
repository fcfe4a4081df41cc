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


class GroupedHllPartial:
    """map_batches stage: one serialized HLL PER GROUP per batch — the
    grouped counterpart of HllPartial (distinct-cardinality per key at
    sketch cost). Scale shape: O(blocks x groups) tiny (group, hll)
    rows reach the merge; the value stream itself never shuffles —
    unlike an exact two-level groupby, whose first level moves every
    (group, value) pair."""

    def __init__(self, group_col: str, value_col: str, p: int = 14):
        self.group_col = group_col
        self.value_col = value_col
        self.p = p

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "g": batch[self.group_col].to_numpy(zero_copy_only=False),
                "v": batch[self.value_col].to_numpy(zero_copy_only=False),
            }
        ).dropna()
        groups, blobs = [], []
        for g, part in df.groupby("g", sort=False):
            h = HyperLogLog(self.p)
            arr = part["v"].to_numpy()
            if arr.dtype.kind not in ("i", "u"):
                arr = arr.astype(object)
            h.add(arr)
            groups.append(g)
            blobs.append(h.to_bytes())
        return pa.table(
            {"g": pa.array(groups, pa.string()), "hll": pa.array(blobs, pa.binary())}
        )


def merge_grouped_hlls(rows: list[dict]) -> dict[str, float]:
    """Tree-merge (group, hll) partial rows → per-group estimates."""
    merged: dict[str, HyperLogLog] = {}
    for r in rows:
        h = HyperLogLog.from_bytes(r["hll"])
        merged[r["g"]] = merged[r["g"]].merge(h) if r["g"] in merged else h
    return {g: h.estimate() for g, h in merged.items()}


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


# ---------------------------------------------------------------------------
# Group-keyed exact rank select (grouped quantiles / medians in shared passes)


def grouped_exact_ranks(
    ds,
    column: str,
    group_col: str,
    rank_fn,
    *,
    n_bins: int = 512,
    max_collect: int = 1_000_000,
    max_passes: int = 64,
):
    """Exact value at given 0-based ascending ranks, PER GROUP, without
    materializing any group: the grouped generalization of
    ``exact_quantiles``. ``rank_fn(n)`` maps a group's row count to the
    list of ranks wanted for that group (e.g. quantile_disc ranks, or the
    two middle ranks for an interpolated median).

    One shared ``map_batches`` histogram pipeline per iteration serves
    EVERY active (group, rank) item at once — the table is scanned
    O(log_bins(n)) times total, independent of group count, instead of
    once per group (the rescan-per-group anti-pattern VERDICT r2 flagged
    in quantiles_by_type). Driver state is O(n_groups * n_ranks * n_bins)
    ints. A single hot group never lands in one task: only per-(group,
    bin) counts travel. NaN values are dropped (DuckDB NULL-skip parity).

    Returns ``(values, group_n)``: ``values[(group, rank)] -> float`` and
    ``group_n[group] -> row count``.
    """
    import math

    # -- pass 0: per-group (n, min, max) partials, merged on the driver
    def cmm(df):
        import pandas as pd

        v = df[column].to_numpy(dtype=np.float64, na_value=np.nan)
        ok = ~np.isnan(v)
        if not ok.any():
            return pd.DataFrame({"g": [], "n": [], "lo": [], "hi": []})
        sub = pd.DataFrame({"g": df[group_col].to_numpy()[ok], "v": v[ok]})
        agg = sub.groupby("g", sort=False)["v"].agg(["count", "min", "max"])
        return pd.DataFrame(
            {"g": agg.index, "n": agg["count"].to_numpy(np.int64),
             "lo": agg["min"].to_numpy(), "hi": agg["max"].to_numpy()}
        )

    group_n: dict = {}
    group_lo: dict = {}
    group_hi: dict = {}
    for b in ds.map_batches(cmm, batch_format="pandas").iter_batches(batch_format="pandas"):
        for g, nn, lo, hi in zip(b["g"], b["n"], b["lo"], b["hi"]):
            group_n[g] = group_n.get(g, 0) + int(nn)
            group_lo[g] = min(group_lo.get(g, math.inf), float(lo))
            group_hi[g] = max(group_hi.get(g, -math.inf), float(hi))

    # -- item state: key=(group, rank) -> [lo, hi, closed, rank_in_iv, count]
    items: dict = {}
    for g, nn in group_n.items():
        for r in rank_fn(nn):
            if 0 <= r < nn:
                items[(g, int(r))] = [group_lo[g], group_hi[g], True, int(r), nn]

    values: dict = {}

    def _grouped_hist_pass(active_keys):
        ivs = [items[k] for k in active_keys]
        edges = [np.linspace(s[0], s[1], n_bins + 1) for s in ivs]
        by_group: dict = {}
        for i, k in enumerate(active_keys):
            by_group.setdefault(k[0], []).append(i)
        specs = [(s[0], s[1], s[2]) for s in ivs]

        def hist(df):
            import pandas as pd

            v_all = df[column].to_numpy(dtype=np.float64, na_value=np.nan)
            gcol = df[group_col].to_numpy()
            rows = []
            # one hash-group pass over the batch; per-item work touches
            # only that group's values
            sub = pd.DataFrame({"g": gcol, "v": v_all})
            for g, part in sub.groupby("g", sort=False):
                idxs = by_group.get(g)
                if not idxs:
                    continue
                v = part["v"].to_numpy()
                v = v[~np.isnan(v)]
                for i in idxs:
                    lo, hi, closed = specs[i]
                    sel = v[_sel_mask(v, lo, hi, closed)]
                    counts, _ = np.histogram(sel, bins=edges[i])
                    rows.append(
                        {
                            "qi": i,
                            "counts": counts.astype(np.int64),
                            "lmin": float(sel.min()) if len(sel) else np.inf,
                            "lmax": float(sel.max()) if len(sel) else -np.inf,
                        }
                    )
            if not rows:
                return pd.DataFrame({"qi": [], "counts": [], "lmin": [], "lmax": []})
            return pd.DataFrame(rows)

        merged = [np.zeros(n_bins, dtype=np.int64) for _ in active_keys]
        lmins = [np.inf] * len(active_keys)
        lmaxs = [-np.inf] * len(active_keys)
        for b in ds.map_batches(hist, batch_format="pandas").iter_batches(
            batch_format="pandas"
        ):
            for qi, counts, lmin, lmax in zip(b["qi"], b["counts"], b["lmin"], b["lmax"]):
                qi = int(qi)
                merged[qi] += np.asarray(counts, dtype=np.int64)
                lmins[qi] = min(lmins[qi], float(lmin))
                lmaxs[qi] = max(lmaxs[qi], float(lmax))
        return merged, edges, lmins, lmaxs

    passes = 0
    while True:
        active = [k for k in items if k not in values and items[k][4] > max_collect]
        if not active or passes >= max_passes:
            break
        passes += 1
        merged, edges, lmins, lmaxs = _grouped_hist_pass(active)
        for qi, k in enumerate(active):
            lo, hi, closed, r, _cnt = items[k]
            counts, e = merged[qi], edges[qi]
            if lmins[qi] >= lmaxs[qi]:
                values[k] = lmins[qi]
                continue
            if hi <= lo or (hi - lo) < 1e-300:
                values[k] = lo
                continue
            cum = np.cumsum(counts)
            j = int(np.searchsorted(cum, r + 1))
            before = int(cum[j - 1]) if j > 0 else 0
            nlo, nhi = float(e[j]), float(e[j + 1])
            if nhi <= nlo:
                values[k] = nlo
                continue
            nclosed = closed and j == n_bins - 1
            # SNAP to the observed value range (see exact_quantiles)
            if lmins[qi] > nlo:
                nlo = lmins[qi]
            if lmaxs[qi] < nhi:
                nhi = lmaxs[qi]
                nclosed = True
            items[k] = [nlo, nhi, nclosed, r - before, int(counts[j])]

    rest = [k for k in items if k not in values]
    if rest:
        specs = [(items[k][0], items[k][1], items[k][2]) for k in rest]
        by_group: dict = {}
        for i, k in enumerate(rest):
            by_group.setdefault(k[0], []).append(i)

        def collect(df):
            import pandas as pd

            v_all = df[column].to_numpy(dtype=np.float64, na_value=np.nan)
            sub = pd.DataFrame({"g": df[group_col].to_numpy(), "v": v_all})
            rows = []
            for g, part in sub.groupby("g", sort=False):
                idxs = by_group.get(g)
                if not idxs:
                    continue
                v = part["v"].to_numpy()
                v = v[~np.isnan(v)]
                for i in idxs:
                    lo, hi, closed = specs[i]
                    sel = v[_sel_mask(v, lo, hi, closed)]
                    if len(sel):
                        rows.append({"qi": i, "vals": sel})
            if not rows:
                return pd.DataFrame({"qi": [], "vals": []})
            return pd.DataFrame(rows)

        pools: dict = {i: [] for i in range(len(rest))}
        for b in ds.map_batches(collect, batch_format="pandas").iter_batches(
            batch_format="pandas"
        ):
            for qi, vals in zip(b["qi"], b["vals"]):
                pools[int(qi)].append(np.asarray(vals, dtype=np.float64))
        for i, k in enumerate(rest):
            vals = np.sort(np.concatenate(pools[i])) if pools[i] else np.array([items[k][0]])
            values[k] = float(vals[min(items[k][3], len(vals) - 1)])
    return values, group_n


def grouped_topk(ds, *, group_col: str, order_col: str, k: int,
                 descending: bool = True, tie_cols: list[str] | None = None):
    """Top-k rows PER GROUP — the grouped counterpart of sort+limit.

    Scale shape: a per-batch combiner keeps at most k rows per group
    per batch (vectorized pandas sort + ``groupby().head(k)``), so at
    most k x n_groups rows leave any block; ONE ``groupby(group_col)``
    shuffle then merges the partials and re-takes the top k per group.
    A hot group never materializes — it streams through as k-sized
    partials (k x n_blocks rows at the merge, independent of group row
    count). Ties break deterministically on ``tie_cols`` (ascending).
    Null group keys form their own group (SQL ROW_NUMBER PARTITION BY
    semantics — pandas' default dropna would silently drop them).

    Returns a Dataset with the input columns, k rows per group.
    """
    import pandas as pd

    ties = tie_cols or []
    by = [order_col] + ties
    asc = [not descending] + [True] * len(ties)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(by, ascending=asc, kind="mergesort")
            .groupby(group_col, sort=False, dropna=False)
            .head(k)
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .map_groups(partial, batch_format="pandas")
    )


def filter_by_quantile(
    ds,
    column: str,
    *,
    lo: float = 0.0,
    hi: float = 1.0,
    keep_null: bool = False,
    n_bins: int = 1024,
):
    """Keep rows whose ``column`` value lies within the corpus's
    [``lo``, ``hi``] quantile band — the percentile-based quality
    filter (e.g. drop the worst 10% by LM perplexity: ``lo=0,
    hi=0.9``). Thresholds come from ``exact_quantiles`` (histogram
    narrowing — O(log n) streaming passes, never a materialized
    column), then ONE more streamed filter pass applies them; the band
    is closed on both ends so exactly the ranked values survive.
    ``keep_null`` controls rows with null scores (dropped by default)."""
    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError(f"need 0 <= lo <= hi <= 1, got lo={lo} hi={hi}")
    import pyarrow.compute as _pc

    qs = exact_quantiles(ds, column, [lo, hi], n_bins=n_bins)
    lo_v, hi_v = qs[lo], qs[hi]

    def band(t: pa.Table) -> pa.Table:
        col = t[column]
        keep = _pc.and_(
            _pc.greater_equal(col, lo_v), _pc.less_equal(col, hi_v)
        )
        keep = _pc.fill_null(keep, keep_null)
        return t.filter(keep)

    return ds.map_batches(band, batch_format="pyarrow", zero_copy_batch=True)
