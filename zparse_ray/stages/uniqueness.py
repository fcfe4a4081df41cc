"""D6 fast path: doc_id uniqueness via partitioned Bloom-filter shards.

The exact path (pipelines/validate.py phase 2a) shuffles the compact
docmeta stream through groupby(doc_id). At 10^12 ids even that shuffle
is heavy; the probabilistic prefilter cuts it to the candidate set:

  - N shard ACTORS each own one Bloom filter (~1.2 GB per 10^9 keys at
    1% FPR); this is genuinely shared mutable state across batches, the
    one shape Dataset API can't express — hence raw `@ray.remote`
    actors (SURVEY §2.4 D6, §7.3)
  - routing happens INSIDE `map_batches` tasks that hold the shard
    actor handles — ids never stream through the driver (VERDICT r1
    flagged the old driver-side `iter_batches` loop as the bottleneck
    at 10^12 ids); each id always routes to the same shard via
    hash(doc_id) % N, and actor calls serialize per shard, so a dup
    split across two concurrent batches is still seen by whichever
    call lands second
  - the candidate set is then confirmed EXACTLY (a distributed filter
    + groupby on candidates only — a shuffle of |dups| + FPR·|ids|
    rows instead of |ids|)

Determinism note: candidates depend on arrival order inside a shard but
the CONFIRMED result never does — confirmation recounts exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import BloomFilter, hash64


def _shard_of(ids: np.ndarray, n_shards: int) -> np.ndarray:
    return (hash64(ids, seed=7) % np.uint64(n_shards)).astype(np.int64)


def make_shard_actor():
    """Define the actor class lazily (ray import at call time)."""
    import ray

    @ray.remote
    class BloomShard:
        def __init__(self, capacity: int, fpr: float):
            self.bloom = BloomFilter.for_capacity(capacity, fpr)

        def check_and_add(self, ids: np.ndarray) -> np.ndarray:
            """Returns the subset of ids already seen (candidate
            duplicates), then adds all ids. An id repeated WITHIN this
            batch is a candidate too (the whole batch is tested before
            it is added)."""
            import pandas as pd

            ids = np.asarray(ids, dtype=object)
            within = pd.Series(ids).duplicated(keep="first").to_numpy()
            hits = self.bloom.contains(ids) | within
            self.bloom.add(ids)
            return ids[hits]

        def stats(self) -> dict:
            bits = self.bloom.bits
            return {
                "n_bits": self.bloom.n_bits,
                "fill": float(np.unpackbits(bits.view(np.uint8)).mean()),
            }

    return BloomShard


def _route_batch(batch: pa.Table, *, shards, n_shards: int) -> pa.Table:
    """Worker-side router: split the batch's ids by shard hash, probe the
    shard actors, and emit only the candidate hits (tiny output)."""
    import ray

    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    if not len(ids):
        return pa.table({"doc_id": pa.array([], pa.string())})
    shard_idx = _shard_of(ids, n_shards)
    refs = []
    for si in range(n_shards):
        part = ids[shard_idx == si]
        if len(part):
            refs.append(shards[si].check_and_add.remote(part))
    hit_arrays = [a for a in ray.get(refs) if len(a)]
    hits = np.concatenate(hit_arrays) if hit_arrays else np.array([], dtype=object)
    return pa.table({"doc_id": pa.array(hits.tolist(), pa.string())})


def bloom_candidate_dups(
    meta_ds,
    *,
    n_shards: int = 8,
    capacity_per_shard: int = 2_000_000,
    fpr: float = 0.01,
    batch_size: int = 65_536,
) -> set:
    """Probe doc_ids against the shard actors from inside map_batches
    tasks; returns the candidate duplicate id set (superset of true
    duplicates). Only candidate hits reach the driver."""
    import ray

    BloomShard = make_shard_actor()
    shards = [BloomShard.remote(capacity_per_shard, fpr) for _ in range(n_shards)]
    cand_ds = meta_ds.map_batches(
        _route_batch,
        fn_kwargs={"shards": shards, "n_shards": n_shards},
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    candidates = {r["doc_id"] for r in cand_ds.take_all()}
    for s in shards:
        ray.kill(s)
    return candidates


def confirm_dups_exact(meta_ds, candidates: set) -> dict[str, int]:
    """Exact confirmation pass: broadcast the candidate set, filter ids
    distributedly, then a groupby over ONLY the matching rows; returns
    {doc_id: count>1}. Nothing but candidate occurrences shuffles or
    reaches the driver."""
    import ray

    if not candidates:
        return {}
    cand_ref = ray.put(pa.array(sorted(candidates), pa.string()))

    def _filter(t: pa.Table, *, ref) -> pa.Table:
        vs = ray.get(ref)  # zero-copy plasma read per task
        return t.select(["doc_id"]).filter(pc.is_in(t["doc_id"], value_set=vs))

    counts = (
        meta_ds.map_batches(
            _filter,
            fn_kwargs={"ref": cand_ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("doc_id")
        .count()
    )
    rows = counts.take_all()
    if not rows:
        return {}
    cnt_col = next(c for c in rows[0] if c != "doc_id")
    return {r["doc_id"]: r[cnt_col] for r in rows if r[cnt_col] > 1}
