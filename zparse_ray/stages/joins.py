"""Distributed joins.

Two shapes, chosen by side size (SURVEY §2.4 D7 / §4.2):

- Broadcast join (small side fits in the object store): ``ray.put`` the
  small table once, merge inside ``map_batches`` — no shuffle. Used by
  the dimension-join queries (top_customers etc.).
- Bucketed shuffle join (both sides large): hash-partition BOTH sides
  by ``hash(key) % n_buckets`` in a map stage, co-locate the buckets
  with ONE ``groupby("__bucket")`` shuffle, and run a vectorized pandas
  merge per bucket inside ``map_groups``. This is the partitioned hash
  join a 100-TB cluster needs: the shuffle moves each row once, bucket
  merges are C-speed, and skew is bounded by bucket count (salt the
  bucket key by raising ``n_buckets``).

The per-KEY ``groupby(key).map_groups`` alternative is deliberately
avoided: millions of tiny groups mean a Python callback per key.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.sketches import hash64

logger = logging.getLogger("zparse_ray.joins")

# sizing: target rows per bucket task, and the row count past which a
# single bucket is flagged as hot (a pandas merge of that size in one
# task is the skew signal callers should see)
ROWS_PER_BUCKET = 2_000_000
HOT_BUCKET_WARN_ROWS = 8_000_000


def resolve_n_buckets(est_rows: int | None, n_buckets: int | None = None) -> int:
    """Bucket count for a hash-shuffle join: explicit wins; else scale
    with the estimated TOTAL row count so buckets stay ~ROWS_PER_BUCKET
    (a fixed 64 means multi-GB single-task merges at 100 TB — VERDICT
    r2 item 8). NB salting only rebalances DISTINCT keys: one
    degenerate key still lands whole in its bucket; the hot-bucket
    warning in the merge stage surfaces that residual."""
    if n_buckets is not None:
        return n_buckets
    if est_rows is None:
        return 64
    return int(min(4096, max(64, est_rows // ROWS_PER_BUCKET + 1)))


def _bucket_of(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    vals = col.to_numpy(zero_copy_only=False)
    if vals.dtype.kind not in ("i", "u"):
        vals = vals.astype(object)
    return (hash64(vals, seed=11) % np.uint64(n_buckets)).astype(np.int32)


def _warn_if_hot(n_rows: int, where: str) -> None:
    if n_rows > HOT_BUCKET_WARN_ROWS:
        logger.warning(
            "%s: hot bucket with %d rows (> %d) — raise n_buckets/est_rows, "
            "or a single degenerate key dominates (salting cannot split one key)",
            where,
            n_rows,
            HOT_BUCKET_WARN_ROWS,
        )


def bucketed_shuffle_join(
    left_ds,
    right_ds,
    *,
    left_on: str,
    right_on: str,
    n_buckets: int | None = None,
    est_rows: int | None = None,
    how: str = "inner",
):
    """Join two Datasets on a key with one hash shuffle. Returns a
    Dataset of merged rows (pandas-merge column semantics; the right
    key column is dropped when names differ). Column name collisions
    other than the keys are the caller's responsibility."""
    n_buckets = resolve_n_buckets(est_rows, n_buckets)
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    shared = set(left_cols) & set(right_cols)
    if shared:
        raise ValueError(f"column collision: {sorted(shared)}")
    all_cols = left_cols + right_cols
    col_type = {
        **dict(zip(left_schema.names, left_schema.types)),
        **dict(zip(right_schema.names, right_schema.types)),
    }

    def tag(side: int, key: str, own_cols: list[str]):
        def f(t: pa.Table) -> pa.Table:
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                if c in own_cols:
                    arrays.append(t[c])
                else:
                    # typed nulls so both sides union with ONE schema
                    arrays.append(pa.nulls(t.num_rows, type=col_type[c]))
            names.append("__bucket")
            arrays.append(pa.array(_bucket_of(t[key], n_buckets), pa.int32()))
            names.append("__side")
            arrays.append(pa.array(np.full(t.num_rows, side, dtype=np.int8), pa.int8()))
            return pa.table(dict(zip(names, arrays)))

        return f

    tl = left_ds.map_batches(tag(0, left_on, left_cols), batch_format="pyarrow")
    tr = right_ds.map_batches(tag(1, right_on, right_cols), batch_format="pyarrow")
    u = tl.union(tr)

    def join_bucket(t: pa.Table) -> pa.Table:
        # split sides in ARROW so the typed-null columns keep their
        # original dtypes (a pandas split would coerce int64-with-nulls
        # to float64 before the null rows are even dropped)
        import pyarrow.compute as pc

        _warn_if_hot(t.num_rows, "bucketed_shuffle_join")
        lmask = pc.equal(t["__side"], 0)
        lf = t.filter(lmask).select(left_cols).to_pandas()
        rf = t.filter(pc.invert(lmask)).select(right_cols).to_pandas()
        m = lf.merge(rf, left_on=left_on, right_on=right_on, how=how)
        if right_on != left_on and right_on in m.columns:
            if how in ("outer", "right"):
                # right-only rows carry the key only in right_on —
                # coalesce before dropping or those rows lose their key
                m[left_on] = m[left_on].fillna(m[right_on])
            m = m.drop(columns=[right_on])
        return pa.Table.from_pandas(m, preserve_index=False).replace_schema_metadata(None)

    return u.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def bucketed_semi_mark(
    left_ds,
    keys_ds,
    *,
    left_on: str,
    key_col: str,
    n_buckets: int | None = None,
    est_rows: int | None = None,
):
    """Semi/anti-join MARKER at shuffle scale: returns the left rows
    plus an ``__hit`` int64 column (1 = key present in ``keys_ds``).
    The scale path when the distinct key set is too large to broadcast
    (the unbounded ``take_all`` ADVICE r2 flagged): keys are deduped
    per batch BEFORE the shuffle (combiner), both sides co-locate with
    ONE ``groupby(hash(key) % n_buckets)`` shuffle, and each bucket
    runs a vectorized sorted-membership test. Only (key, bucket) pairs
    move for the key side; left rows move once."""
    n_buckets = resolve_n_buckets(est_rows, n_buckets)
    left_schema = left_ds.schema()
    left_cols = list(left_schema.names)
    if "__k" in left_cols:
        raise ValueError("left side may not contain a __k column")
    key_type = dict(zip(keys_ds.schema().names, keys_ds.schema().types))[key_col]

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in left_cols}
        cols["__k"] = pa.nulls(t.num_rows, type=key_type)
        cols["__bucket"] = pa.array(_bucket_of(t[left_on], n_buckets), pa.int32())
        cols["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8())
        return pa.table(cols)

    def tag_keys(t: pa.Table) -> pa.Table:
        ks = t[key_col].to_numpy(zero_copy_only=False)
        ks = np.unique(ks)  # per-block combiner: dedup before the shuffle
        arr = pa.array(ks, type=key_type)
        cols = {
            c: pa.nulls(len(ks), type=ty)
            for c, ty in zip(left_schema.names, left_schema.types)
        }
        cols["__k"] = arr
        cols["__bucket"] = pa.array(_bucket_of(arr, n_buckets), pa.int32())
        cols["__side"] = pa.array(np.ones(len(ks), dtype=np.int8), pa.int8())
        return pa.table(cols)

    tl = left_ds.map_batches(tag_left, batch_format="pyarrow")
    tk = keys_ds.map_batches(tag_keys, batch_format="pyarrow")

    def mark_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        _warn_if_hot(t.num_rows, "bucketed_semi_mark")
        lmask = pc.equal(t["__side"], 0)
        lf = t.filter(lmask).select(left_cols)
        keys = t.filter(pc.invert(lmask))["__k"].to_numpy(zero_copy_only=False)
        pk = lf[left_on].to_numpy(zero_copy_only=False)
        if lf.num_rows == 0:
            hit = np.zeros(0, dtype=np.int64)
        elif len(keys) == 0:
            hit = np.zeros(lf.num_rows, dtype=np.int64)
        elif pk.dtype.kind in ("i", "u", "f"):
            ks = np.unique(keys)
            pos = np.clip(np.searchsorted(ks, pk), 0, len(ks) - 1)
            hit = (ks[pos] == pk).astype(np.int64)
        else:
            hit = np.isin(pk, keys).astype(np.int64)
        return lf.append_column("__hit", pa.array(hit, pa.int64()))

    return tl.union(tk).groupby("__bucket").map_groups(mark_bucket, batch_format="pyarrow")


def bucketed_asof_join(
    left_ds,
    right_ds,
    *,
    on: str,
    by: str,
    right_cols: list[str],
    n_buckets: int | None = None,
    est_rows: int | None = None,
    allow_exact_matches: bool = False,
    direction: str = "backward",
):
    """Distributed as-of join: every left row joins the nearest prior
    (or following) right row of the same ``by`` key. Scale shape: both
    sides co-locate by ``hash(by) % n_buckets`` (same skew-safe hash +
    dynamic bucket count as the other joins here) with ONE shuffle;
    each bucket splits sides in ARROW (typed-null columns keep their
    dtypes — a pandas split would coerce int64-with-nulls to float64),
    sorts once by ``on``, and a single C-level
    ``pd.merge_asof(..., by=by)`` handles every key in the bucket — no
    per-key map_groups dispatch. ``right_cols`` are the right-side
    value columns to carry (must not collide with left columns); rows
    with no match carry typed nulls for them."""
    n_buckets = resolve_n_buckets(est_rows, n_buckets)
    left_schema = left_ds.schema()
    left_cols = list(left_schema.names)
    shared = set(left_cols) & set(right_cols)
    if shared:
        raise ValueError(f"column collision: {sorted(shared)}")
    left_type = dict(zip(left_schema.names, left_schema.types))
    right_schema = right_ds.schema()
    right_type = dict(zip(right_schema.names, right_schema.types))
    r_side_cols = [on, by] + [c for c in right_cols if c not in (on, by)]

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            cols = {}
            for c in left_cols:
                cols[c] = t[c] if side == 0 else pa.nulls(t.num_rows, type=left_type[c])
            for c in right_cols:
                cols[c] = t[c] if side == 1 else pa.nulls(t.num_rows, type=right_type[c])
            if side == 1:
                cols[on] = t[on]
                cols[by] = t[by]
            cols["__bucket"] = pa.array(_bucket_of(t[by], n_buckets), pa.int32())
            cols["__side"] = pa.array(np.full(t.num_rows, side, dtype=np.int8), pa.int8())
            return pa.table(cols)

        return f

    tl = left_ds.map_batches(tag(0), batch_format="pyarrow")
    tr = right_ds.map_batches(tag(1), batch_format="pyarrow")

    def asof_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        _warn_if_hot(t.num_rows, "bucketed_asof_join")
        lmask = pc.equal(t["__side"], 0)
        lf = t.filter(lmask).select(left_cols).to_pandas()
        rt = t.filter(pc.invert(lmask)).select(r_side_cols)
        out_schema = pa.schema(
            [(c, left_type[c]) for c in left_cols]
            + [(c, right_type[c]) for c in right_cols]
        )
        if rt.num_rows == 0:
            nulls = {c: pa.nulls(len(lf), type=right_type[c]) for c in right_cols}
            return pa.table(
                {**{c: pa.Array.from_pandas(lf[c], type=left_type[c]) for c in left_cols},
                 **nulls},
                schema=out_schema,
            )
        # match on (on, by) via pandas, but carry right VALUES through an
        # Arrow take on the matched row indices — int64 right_cols never
        # transit pandas float64 (which silently corrupts > 2^53)
        rkeys = rt.select([on, by]).to_pandas()
        order = rkeys.sort_values([on, by], kind="mergesort").index.to_numpy()
        rt_s = rt.take(pa.array(order, pa.int64()))
        rk = rkeys.iloc[order].reset_index(drop=True)
        rk["__ri"] = np.arange(len(rk), dtype=np.int64)
        m = pd.merge_asof(
            lf.sort_values([on, by], kind="mergesort"),
            rk,
            on=on,
            by=by,
            allow_exact_matches=allow_exact_matches,
            direction=direction,
        )
        idx = pa.array(m["__ri"].to_numpy(), type=pa.int64(), from_pandas=True)
        arrays = [pa.Array.from_pandas(m[c], type=left_type[c]) for c in left_cols] + [
            rt_s[c].take(idx).combine_chunks() for c in right_cols
        ]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return tl.union(tr).groupby("__bucket").map_groups(asof_bucket, batch_format="pyarrow")


def broadcast_lookup_join(ds, small: pa.Table, *, left_on: str, right_on: str):
    """Broadcast INNER join against a small unique-key dimension table,
    Arrow-native per batch (VERDICT r3 item 5 — the shared helper for
    the dimension-join queries): the dimension is ``ray.put`` once as
    (key array, value columns); each batch computes
    ``pc.index_in(left key, dim keys)`` and Arrow-takes the dimension
    columns onto the batch — no per-batch pandas round trip (pandas
    merge re-materializes every string column per batch). Unmatched
    left rows drop; the dimension key column is not carried.

    Contract: ``small[right_on]`` has unique, non-null keys (a
    dimension's primary key) — both are ENFORCED here, because
    ``index_in`` would silently take the first match and drop join
    multiplicity for a duplicated key. The small side must fit in the
    object store — past that, use bucketed_shuffle_join."""
    import pyarrow.compute as pc
    import ray

    if small[right_on].null_count:
        raise ValueError(f"{right_on}: dimension key contains nulls")
    n_uniq = len(pc.unique(small[right_on].combine_chunks()))
    if n_uniq != small.num_rows:
        raise ValueError(
            f"{right_on}: dimension key is not unique "
            f"({small.num_rows - n_uniq} duplicate rows)"
        )
    keys = small[right_on].combine_chunks()
    vals = small.drop_columns([right_on]).combine_chunks()
    ref = ray.put((keys, vals))

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ks, vs = ray.get(ref)
        idx = pc.index_in(t[left_on], value_set=ks)
        valid = pc.is_valid(idx)
        out = t.filter(valid)
        idx = pc.filter(idx, valid)
        for name in vs.column_names:
            out = out.append_column(name, vs[name].take(idx))
        return out

    return ds.map_batches(f, batch_format="pyarrow")


def broadcast_join(ds, small_df: pd.DataFrame, *, left_on: str, right_on: str, how: str = "inner"):
    """Broadcast the small side once via ray.put; merge per batch."""
    import ray

    ref = ray.put(small_df)

    def f(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df.merge(ray.get(ref), left_on=left_on, right_on=right_on, how=how)
        if right_on != left_on and right_on in m.columns:
            m = m.drop(columns=[right_on])
        return pa.Table.from_pandas(m, preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(f, batch_format="pyarrow")


def range_count_join(
    intervals_ds,
    points_ds,
    *,
    start_col: str,
    ts_col: str,
    group_col: str,
    width_us: int,
):
    """Range join (count form): for each interval [start, start+width)
    count the points whose timestamp falls inside, aggregated per
    `group_col`. Distributed as an interval-bucket join: the time axis
    is bucketed at `width_us` granularity, so every interval overlaps at
    most TWO buckets (it is exactly one bucket wide) and every point
    exactly one — ONE groupby(bucket) shuffle co-locates them, and each
    bucket does a vectorized searchsorted count of ITS OWN points per
    interval (each (interval, point) pair is counted once because the
    point exists in exactly one bucket). Per-bucket partials then sum in
    a tiny keyed aggregate. No interval ever sees points outside its two
    buckets — the all-pairs blowup a naive cross join would have.

    Skew: one task holds one time-bucket's rows; a hot bucket (all
    points in one width-window) concentrates there. The searchsorted
    count is O((n_iv + n_pt) log n_pt) per bucket — compute stays cheap
    even for hot buckets; if a single bucket's ROWS outgrow a task,
    shrink width_us and split intervals into more copies (width/bucket
    ratio k -> k+1 copies per interval), trading shuffle volume for
    balance."""
    import pyarrow.compute as pc

    W = width_us

    def tag_intervals(t: pa.Table) -> pa.Table:
        s = pc.cast(t[start_col], pa.int64()).to_numpy()
        g = t[group_col].to_numpy(zero_copy_only=False)
        b0 = s // W
        b1 = (s + W - 1) // W
        two = b1 != b0
        starts = np.concatenate([s, s[two]])
        groups = np.concatenate([g, g[two]])
        buckets = np.concatenate([b0, b1[two]])
        return pa.table(
            {
                "__bucket": pa.array(buckets, pa.int64()),
                "__start": pa.array(starts, pa.int64()),
                "__group": pa.array(groups.astype(object), pa.string()),
                "__ts": pa.nulls(len(starts), pa.int64()),
                "__side": pa.array(np.zeros(len(starts), dtype=np.int8), pa.int8()),
            }
        )

    def tag_points(t: pa.Table) -> pa.Table:
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy()
        n = len(ts)
        return pa.table(
            {
                "__bucket": pa.array(ts // W, pa.int64()),
                "__start": pa.nulls(n, pa.int64()),
                "__group": pa.nulls(n, pa.string()),
                "__ts": pa.array(ts, pa.int64()),
                "__side": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            }
        )

    ti = intervals_ds.map_batches(tag_intervals, batch_format="pyarrow")
    tp = points_ds.map_batches(tag_points, batch_format="pyarrow")

    def count_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lmask = pc.equal(t["__side"], 0)
        iv = t.filter(lmask)
        ts = np.sort(t.filter(pc.invert(lmask))["__ts"].to_numpy(zero_copy_only=False).astype(np.int64))
        if not len(ts) or not iv.num_rows:
            return pa.table({"group": pa.array([], pa.string()),
                             "n_part": pa.array([], pa.int64())})
        starts = iv["__start"].to_numpy(zero_copy_only=False).astype(np.int64)
        groups = iv["__group"].to_numpy(zero_copy_only=False)
        counts = np.searchsorted(ts, starts + W) - np.searchsorted(ts, starts)
        out: dict[str, int] = {}
        for grp, c in zip(groups, counts):
            if c:
                out[grp] = out.get(grp, 0) + int(c)
        return pa.table(
            {
                "group": pa.array(list(out), pa.string()),
                "n_part": pa.array(list(out.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ti.union(tp)
        .groupby("__bucket")
        .map_groups(count_bucket, batch_format="pyarrow")
        .groupby("group")
        .aggregate(Sum("n_part", alias_name="n_hits"))
    )
