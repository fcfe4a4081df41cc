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

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.sketches import hash64


def _bucket_of(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    vals = col.to_numpy(zero_copy_only=False)
    if vals.dtype.kind not in ("i", "u"):
        vals = vals.astype(object)
    return (hash64(vals, seed=11) % np.uint64(n_buckets)).astype(np.int32)


def bucketed_shuffle_join(
    left_ds,
    right_ds,
    *,
    left_on: str,
    right_on: str,
    n_buckets: int = 64,
    how: str = "inner",
):
    """Join two Datasets on a key with one hash shuffle. Returns a
    Dataset of merged rows (pandas-merge column semantics; the right
    key column is dropped when names differ). Column name collisions
    other than the keys are the caller's responsibility."""
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

        lmask = pc.equal(t["__side"], 0)
        lf = t.filter(lmask).select(left_cols).to_pandas()
        rf = t.filter(pc.invert(lmask)).select(right_cols).to_pandas()
        m = lf.merge(rf, left_on=left_on, right_on=right_on, how=how)
        if right_on != left_on and right_on in m.columns:
            m = m.drop(columns=[right_on])
        return pa.Table.from_pandas(m, preserve_index=False)

    return u.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def broadcast_join(ds, small_df: pd.DataFrame, *, left_on: str, right_on: str, how: str = "inner"):
    """Broadcast the small side once via ray.put; merge per batch."""
    import ray

    ref = ray.put(small_df)

    def f(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df.merge(ray.get(ref), left_on=left_on, right_on=right_on, how=how)
        if right_on != left_on and right_on in m.columns:
            m = m.drop(columns=[right_on])
        return pa.Table.from_pandas(m, preserve_index=False)

    return ds.map_batches(f, batch_format="pyarrow")
