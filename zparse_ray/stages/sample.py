"""Deterministic sampling operators for training-data pipelines.

Three shapes, all RNG-free (stable across runs, workers, block splits
and engines — the property a reproducible data pipeline needs; same
rationale as ``textops.split_assign_batch``):

- ``hash_sample``: Bernoulli-by-hash row sampling — keep a row iff
  ``((id + seed) * 2654435761) mod 2^64 mod 10^6 < rate_ppm``. The
  Knuth multiplicative hash is SQL-reproducible as HUGEINT arithmetic
  (``% 18446744073709551616``), so DuckDB can verify the exact sample
  (see the parity test). Pure per-batch filter, zero shuffle.
- ``stratified_hash_sample``: per-group rates (e.g. downsample each
  language to a quota) via one broadcast (group -> rate_ppm) lookup
  (``pc.index_in`` + take, the ``joins.broadcast_lookup_join`` trick)
  and the same hash rule. Zero shuffle.
- ``hash_topk_sample``: EXACT-k uniform-without-replacement sample as
  "the k rows with the smallest ``hash64(id, seed)``" (consistent /
  bottom-k sampling): each batch keeps its k smallest locally (a
  k-sized partial, the ``ann_topk`` partial+merge shape), the driver
  merges O(blocks * k) partials. The k-row result is small by
  contract, so driver materialization is the right call; the input
  itself streams. Samples are NESTED across k (bottom-(k1) is a
  subset of bottom-(k2) for k1 < k2) and mergeable across corpora —
  what a 100-TB progressive-sampling loop wants.

Granularity note (documented, matches ``split_assign_batch``): ids
that are all multiples of 2^j give Knuth products that are multiples
of 2^min(j,6) mod 10^6, so the realized rate quantizes to steps of
2^min(j,6)/10^6 — at most 64 ppm. Pass a seed to decorrelate repeated
samples of the same table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import hash64

_KNUTH = np.uint64(2654435761)
_PPM = np.uint64(1_000_000)


def rate_to_ppm(rate: float) -> int:
    """Clamp + round a [0,1] rate to parts-per-million (the integer the
    hash rule and its SQL oracle both compare against)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sampling rate must be in [0,1], got {rate}")
    return int(round(rate * 1_000_000))


def _ppm_bucket(ids: np.ndarray, seed: int) -> np.ndarray:
    """Ids must be non-negative: numpy would wrap a negative id to
    uint64 while the documented DuckDB HUGEINT oracle keeps the
    dividend's sign (a negative remainder is always < rate_ppm), so
    parity would silently break — fail loudly instead."""
    if ids.dtype.kind == "i" and len(ids) and ids.min() < 0:
        raise ValueError("hash sampling requires non-negative ids (SQL parity)")
    with np.errstate(over="ignore"):
        return ((ids.astype(np.uint64) + np.uint64(seed)) * _KNUTH) % _PPM


def hash_sample_batch(
    batch: pa.Table,
    *,
    rate_ppm: int,
    id_column: str = "doc_id",
    seed: int = 0,
) -> pa.Table:
    """Keep rows whose Knuth-hash ppm bucket is < ``rate_ppm``."""
    ids = batch[id_column].to_numpy(zero_copy_only=False)
    keep = _ppm_bucket(ids, seed) < np.uint64(rate_ppm)
    return batch.filter(pa.array(keep))


def hash_sample(ds, rate: float, *, id_column: str = "doc_id", seed: int = 0):
    """Deterministic Bernoulli sample of ``rate`` of the rows."""
    ppm = rate_to_ppm(rate)
    return ds.map_batches(
        hash_sample_batch,
        fn_kwargs={"rate_ppm": ppm, "id_column": id_column, "seed": seed},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def stratified_sample_batch(
    batch: pa.Table,
    *,
    group_keys: np.ndarray,
    group_ppm: np.ndarray,
    group_column: str = "lang",
    id_column: str = "doc_id",
    default_ppm: int = 0,
    seed: int = 0,
) -> pa.Table:
    """Per-group-rate filter: one ``pc.index_in`` lookup of the row's
    group into the broadcast (keys, ppm) pair, then the hash rule."""
    idx = (
        pc.index_in(batch[group_column], pa.array(group_keys))
        .fill_null(-1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    table = np.append(np.asarray(group_ppm, dtype=np.uint64), np.uint64(default_ppm))
    ppm = table[idx]  # idx == -1 (unlisted group) indexes the appended default
    ids = batch[id_column].to_numpy(zero_copy_only=False)
    keep = _ppm_bucket(ids, seed) < ppm
    return batch.filter(pa.array(keep))


def stratified_hash_sample(
    ds,
    rates: dict[str, float],
    *,
    group_column: str = "lang",
    id_column: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
):
    """Deterministic per-group downsampling (language-quota rebalancing
    etc.). ``rates`` maps group value -> keep rate; groups not listed
    get ``default_rate``. The (keys, ppm) table ships by value in the
    task closure — it is O(#groups), tiny by contract."""
    keys = np.array(sorted(rates), dtype=object)
    ppm = np.array([rate_to_ppm(rates[k]) for k in keys], dtype=np.uint64)
    return ds.map_batches(
        stratified_sample_batch,
        fn_kwargs={
            "group_keys": keys,
            "group_ppm": ppm,
            "group_column": group_column,
            "id_column": id_column,
            "default_ppm": rate_to_ppm(default_rate),
            "seed": seed,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _bottomk_idx(h: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k smallest rows under (hash, id) order. The id
    tie-break keeps the selection block-layout-independent: integer ids
    can't collide (hash64's mixer is bijective) but string ids hash
    through ``pd.util.hash_array`` first, where collisions at the k
    boundary would otherwise make the sample depend on which block a
    row arrived in."""
    return np.lexsort((ids, h))[:k]


def _bottomk_partial(batch: pa.Table, *, k: int, id_column: str, seed: int) -> pa.Table:
    if "_sample_h" in batch.column_names:
        raise ValueError("input may not contain a _sample_h column")
    ids = batch[id_column].to_numpy(zero_copy_only=False)
    h = hash64(ids, seed=seed)
    if len(h) > k:
        keep = _bottomk_idx(h, ids, k)
        batch = batch.take(pa.array(keep))
        h = h[keep]
    # carry the sort key through the merge as int64 bits (lossless view)
    return batch.append_column("_sample_h", pa.array(h.view(np.int64), pa.int64()))


def hash_topk_sample(ds, k: int, *, id_column: str = "doc_id", seed: int = 0) -> pa.Table:
    """Exact-k deterministic uniform sample: the k rows with the
    smallest ``hash64(id, seed)``. Returns a ``pyarrow.Table`` of
    <= k rows (small by contract)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    partials = ds.map_batches(
        _bottomk_partial,
        fn_kwargs={"k": k, "id_column": id_column, "seed": seed},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # stream the <=k-row partials to the driver, folding down to k rows
    # whenever the accumulator grows past 4k (memory stays O(k))
    acc: pa.Table | None = None
    for part in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        if part.num_rows == 0:
            continue
        acc = part if acc is None else pa.concat_tables([acc, part])
        if acc.num_rows > 4 * k:
            acc = _bottomk_table(acc, k, id_column)
    if acc is None:
        empty = ds.schema()
        return pa.Table.from_arrays(
            [pa.array([], t) for t in empty.types], names=empty.names
        )
    return _bottomk_table(acc, k, id_column).drop_columns(["_sample_h"])


def _bottomk_table(t: pa.Table, k: int, id_column: str) -> pa.Table:
    if t.num_rows <= k:
        return t
    h = t["_sample_h"].to_numpy().view(np.uint64)
    ids = t[id_column].to_numpy(zero_copy_only=False)
    return t.take(pa.array(_bottomk_idx(h, ids, k)))


def _add_shuffle_key(batch: pa.Table, *, id_column: str, seed: int) -> pa.Table:
    if "_shuffle_key" in batch.column_names:
        raise ValueError("input may not contain a _shuffle_key column")
    ids = batch[id_column].to_numpy(zero_copy_only=False)
    h = hash64(ids, seed=seed).view(np.int64)
    return batch.append_column("_shuffle_key", pa.array(h, pa.int64()))


def deterministic_shuffle(ds, *, id_column: str = "doc_id", seed: int = 0):
    """Global deterministic reshuffle for training order: sort the
    corpus by ``hash64(id, seed)``. RNG-free, so reruns, engines and
    block layouts all produce the SAME order (what
    ``ds.random_shuffle`` cannot promise across runs), and a different
    ``seed`` gives an independent order for the next epoch. Cost is the
    one range-partitioned all-to-all sort any global shuffle pays —
    Ray Data's sort samples key ranges, so the uniform hash keys give
    balanced partitions by construction. The id column breaks 64-bit
    hash ties: integer ids can't collide (the mixer is bijective), but
    STRING ids hash through ``pd.util.hash_array`` first, where the
    birthday bound expects ~30k colliding pairs at 10^12 rows — without
    the tie-break their relative order would be engine-dependent,
    quietly voiding the stability promise."""
    shuffled = ds.map_batches(
        _add_shuffle_key,
        fn_kwargs={"id_column": id_column, "seed": seed},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort(["_shuffle_key", id_column])
    return shuffled.map_batches(
        lambda t: t.drop_columns(["_shuffle_key"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def grouped_cap_sample(ds, k: int, *, group_column: str = "source",
                       id_column: str = "doc_id", seed: int = 0):
    """Keep at most ``k`` rows PER GROUP, chosen deterministically as
    the group's bottom-k by ``hash64(id, seed)`` — the per-domain cap
    of public crawl pipelines (no single site may dominate the
    corpus). Within each group this selects EXACTLY the rows
    ``hash_topk_sample(k)`` would pick from that group alone (same
    (hash, id) order), so caps are consistent/nested across k and
    mergeable across corpora.

    Scale shape: reuses ``stats.grouped_topk`` — a per-batch k-per-
    group combiner, then ONE groupby shuffle of k-sized partials; a
    hot domain streams through as k x n_blocks rows, never
    materializing. Groups stay distributed (contrast with
    ``hash_topk_sample``'s driver fold, which is global-k by
    contract)."""
    from .stats import grouped_topk

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def add_key(batch: pa.Table) -> pa.Table:
        if "_cap_h" in batch.column_names:
            raise ValueError("input may not contain a _cap_h column")
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        # sign-bit flip: int64 ascending order == uint64 ascending
        # order, so the grouped bottom-k picks EXACTLY the rows
        # hash_topk_sample's uint64 lexsort would
        h = (hash64(ids, seed=seed) ^ np.uint64(1 << 63)).view(np.int64)
        return batch.append_column("_cap_h", pa.array(h, pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True)
    capped = grouped_topk(keyed, group_col=group_column, order_col="_cap_h",
                          k=k, descending=False, tie_cols=[id_column])
    return capped.drop_columns(["_cap_h"])
