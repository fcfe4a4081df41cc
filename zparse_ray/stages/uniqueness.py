"""D6 fast path: doc_id uniqueness via partitioned Bloom-filter shards.

The exact path (pipelines/validate.py phase 2a) shuffles the compact
docmeta stream through groupby(doc_id). At 10^12 ids even that shuffle
is heavy; the probabilistic prefilter cuts it to the candidate set:

  - N shard ACTORS each own one Bloom filter (~1.2 GB per 10^9 keys at
    1% FPR); this is genuinely shared mutable state across batches, the
    one shape Dataset API can't express — hence raw `@ray.remote`
    actors (SURVEY §2.4 D6, §7.3)
  - id batches route by hash(doc_id) % N so each id always meets the
    same shard; `check_and_add` returns ids already seen (true dups +
    FPR false positives)
  - the candidate set is then confirmed EXACTLY (groupby on candidates
    only — a shuffle of |dups| + FPR·|ids| rows instead of |ids|)

Determinism note: candidates depend on arrival order inside a shard but
the CONFIRMED result never does — confirmation recounts exactly.
"""

from __future__ import annotations

import numpy as np

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


def bloom_candidate_dups(
    meta_ds,
    *,
    n_shards: int = 8,
    capacity_per_shard: int = 2_000_000,
    fpr: float = 0.01,
    batch_size: int = 65_536,
) -> set:
    """Stream doc_ids through the shard actors; returns the candidate
    duplicate id set (superset of true duplicates)."""
    import ray

    BloomShard = make_shard_actor()
    shards = [BloomShard.remote(capacity_per_shard, fpr) for _ in range(n_shards)]
    pending = []
    candidates: set = set()
    for batch in meta_ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        shard_idx = _shard_of(ids, n_shards)
        for si in range(n_shards):
            part = ids[shard_idx == si]
            if len(part):
                pending.append(shards[si].check_and_add.remote(part))
        # drain periodically to bound in-flight work
        if len(pending) > 4 * n_shards:
            done, pending = pending[: 2 * n_shards], pending[2 * n_shards :]
            for arr in ray.get(done):
                candidates.update(arr.tolist())
    for arr in ray.get(pending):
        candidates.update(arr.tolist())
    for s in shards:
        ray.kill(s)
    return candidates


def confirm_dups_exact(meta_ds, candidates: set) -> dict[str, int]:
    """Exact confirmation pass: count occurrences of candidate ids only;
    returns {doc_id: count>1}. The scan is a cheap vectorized filter —
    no full shuffle."""
    import pandas as pd

    counts: dict[str, int] = {}
    if not candidates:
        return counts
    for batch in meta_ds.iter_batches(batch_size=262_144, batch_format="pyarrow"):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = pd.Series(ids).isin(candidates).to_numpy()
        for i in ids[mask]:
            counts[i] = counts.get(i, 0) + 1
    return {k: v for k, v in counts.items() if v > 1}
