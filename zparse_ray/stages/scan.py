"""Global ordered prefix-scan (distributed running sum in key order).

The missing primitive between the per-group window family (running sum
PARTITIONED BY user — driver_queries.events_running_sum) and truly
global order: SUM(v) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING) with
ONE global ordering. The classic two-phase parallel scan, expressed in
Ray Data:

1. **Partial pass**: ``map_batches`` computes per-RANGE-BUCKET partial
   sums per block (bucket = (key - lo) * n / (hi - lo + 1), a
   monotone range partitioning, so bucket order == key order). Only
   O(blocks x buckets) tiny partial rows reach the driver.
2. **Offset broadcast + local scan**: the driver prefix-sums the
   bucket totals into per-bucket offsets (an O(n_buckets) loop), then
   ONE ``groupby(bucket).map_groups`` co-locates each range, sorts it
   locally, and adds ``offset[bucket] + local cumsum`` — C-speed per
   bucket, no per-key dispatch, no global sort.

Scale notes: the input is traversed twice (both passes recompute the
upstream projection — stateless and column-pruned, the streaming-
friendly choice; materializing the narrow (key, value) dataset between
passes would pin O(rows) in the object store). Skew is bounded by the
RANGE bucketing: a degenerate key region lands in one bucket and is
surfaced by the hot-bucket warning, same contract as the hash joins.

Keys must be unique (the caller's ordering invariant — doc_id / event
ids are); ties would make "running sum at this key" ambiguous.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .joins import _warn_if_hot, resolve_n_buckets


def _range_bucket(keys: np.ndarray, lo: int, hi: int, n_buckets: int) -> np.ndarray:
    # width-based (not multiply-then-divide) so a 2^60-wide key span
    # cannot overflow int64; still monotone in the key
    span = hi - lo + 1
    width = max(1, -(-span // n_buckets))  # ceil
    return ((keys.astype(np.int64) - lo) // width).astype(np.int32)


def global_running_sum(
    make_kv,
    *,
    key_col: str,
    value_col: str,
    key_lo: int,
    key_hi: int,
    n_buckets: int | None = None,
    est_rows: int | None = None,
):
    """Inclusive global running sum of ``value_col`` in ``key_col``
    order. ``make_kv`` is a zero-arg callable returning a fresh Dataset
    with (at least) the integer key and int64 value columns — called
    once per pass, keeping both traversals streaming. Returns a Dataset
    with columns (key_col, value_col, run).
    """
    nb = resolve_n_buckets(est_rows, n_buckets)

    def partial(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = _range_bucket(k, key_lo, key_hi, nb)
        order = np.argsort(b, kind="stable")
        bs = b[order]
        cuts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        sums = np.add.reduceat(v[order], cuts) if len(v) else np.array([], np.int64)
        return pa.table(
            {
                "bucket": pa.array(bs[cuts] if len(v) else np.array([], np.int32), pa.int32()),
                "partial": pa.array(sums, pa.int64()),
            }
        )

    rows = make_kv().map_batches(partial, batch_format="pyarrow").take_all()
    totals: dict[int, int] = {}
    for r in rows:
        totals[r["bucket"]] = totals.get(r["bucket"], 0) + r["partial"]
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]

    def tag(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__bucket", pa.array(_range_bucket(k, key_lo, key_hi, nb), pa.int32())
        )

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        _warn_if_hot(len(df), "global_running_sum")
        df = df.sort_values(key_col)
        base = offsets.get(int(df["__bucket"].iloc[0]), 0)
        run = df[value_col].astype(np.int64).cumsum() + base
        return pd.DataFrame(
            {
                key_col: df[key_col],
                value_col: df[value_col],
                "run": run.astype(np.int64),
            }
        )

    return (
        make_kv()
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(scan_bucket, batch_format="pandas")
    )
