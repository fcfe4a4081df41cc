"""Batched text-embedding inference: the stateful actor-pool stage that
turns a text column into a unit-norm ``list<float64>`` embedding column
— the model-scoring/embedding-generation step of a training-data
pipeline (feeds ``stages/similarity.py``: ANN top-k, cosine near-dup,
IVF indexing).

Scale shape at 100 TB:
- actor pool via ``map_batches(Embedder, concurrency=N)``: the model
  loads ONCE per actor in ``__init__`` (never per batch), batches run
  through ``__call__`` — the canonical stateful-stage contract;
- no shuffle: embedding is a pure per-batch map; downstream consumers
  (ANN / near-dup) decide their own exchange;
- output is built directly as Arrow ``list_(float64)`` from one flat
  values buffer + offsets — NOT via ``from_pandas`` (which coerces
  list columns to the Ray tensor extension and breaks the similarity
  kernels' ``_to_matrix``).

The real-model path is a SEAM, per the multimodal ``decoder=``
precedent (``stages/multimodal.py``): pass ``model_factory`` (a
zero-arg callable returning ``fn(list[str]) -> np.ndarray [n, dim]``,
e.g. a sentence-transformers loader in a GPU deployment — no ML
runtime ships in this container). The default is a deterministic
hashed-character-trigram projection — fake as a semantic model but a
REAL vectorized batch computation (one shared rolling-hash pass over
the batch's concatenated bytes, per-row bucket counts via ``bincount``,
l2 normalize), so the plumbing, schema, determinism and throughput
shape are all honestly exercised.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def hashed_trigram_embed(texts: pa.ChunkedArray | pa.Array, dim: int) -> np.ndarray:
    """Deterministic (n_rows, dim) float64 embedding matrix: bucketed
    counts of 64-bit rolling hashes of all UTF-8 byte trigrams, l2
    normalized. Fully vectorized: the batch concatenates into ONE byte
    buffer, every trigram hash comes from shared prefix sums
    (``textops._dense_window_hashes``), per-row accumulation is one
    ``bincount`` over ``row*dim + bucket`` — no Python loop over rows.
    Rows shorter than 3 bytes hash as a whole into one bucket; null
    rows embed to the zero vector."""
    from ..functions.sketches import hash64
    from .textops import _dense_window_hashes

    W = 3
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    is_null = pc.is_null(arr).to_numpy(zero_copy_only=False)
    s = pc.fill_null(arr, "").to_pandas()
    n_rows = len(s)
    blen = (
        pc.binary_length(pc.cast(pc.fill_null(arr, ""), pa.binary()))
        .to_numpy()
        .astype(np.int64)
    )
    offsets = np.zeros(n_rows + 1, np.int64)
    np.cumsum(blen, out=offsets[1:])

    flat = np.zeros(0, np.int64)
    long_rows = blen >= W
    if long_rows.any():
        buf = np.frombuffer("".join(s.tolist()).encode("utf-8"), dtype=np.uint8)
        H = _dense_window_hashes(buf, W)
        rs = np.flatnonzero(long_rows)
        counts = blen[rs] - (W - 1)
        cum = np.cumsum(counts)
        total = int(cum[-1])
        # concatenated aranges: position index of every valid (row,
        # window-start) pair without materializing per-row slices
        idx = (
            np.arange(total)
            - np.repeat(cum - counts, counts)
            + np.repeat(offsets[rs], counts)
        )
        buckets = (H[idx] % np.uint64(dim)).astype(np.int64)
        flat = np.repeat(rs, counts) * dim + buckets
    # short non-null, non-empty rows: whole-text hash into one bucket
    short = (~long_rows) & (~is_null) & (blen > 0)
    if short.any():
        ss = np.flatnonzero(short)
        b = (hash64(s.to_numpy(dtype=object)[ss]) % np.uint64(dim)).astype(np.int64)
        flat = np.concatenate([flat, ss * dim + b])

    M = np.bincount(flat, minlength=n_rows * dim).reshape(n_rows, dim).astype(np.float64)
    norms = np.linalg.norm(M, axis=1)
    nz = norms > 0
    M[nz] /= norms[nz, None]
    return M


def matrix_to_list_column(M: np.ndarray) -> pa.ListArray:
    """(n, dim) float matrix -> Arrow ``list_(float64)`` column (one
    flat buffer + constant-stride offsets; zero per-row Python)."""
    n, dim = M.shape
    return pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)),
        pa.array(np.ascontiguousarray(M, dtype=np.float64).ravel(), pa.float64()),
    )


class Embedder:
    """Actor-pool ``map_batches`` callable: text column in ->
    ``out_col`` (``list<float64>``, unit-norm) appended.

    ``model_factory``: zero-arg callable returning
    ``fn(list[str]) -> np.ndarray [n, dim]`` — called ONCE here in
    ``__init__`` (the per-actor model load). ``None`` selects the
    deterministic hashed-trigram projection.
    """

    def __init__(
        self,
        dim: int = 64,
        model_factory=None,
        text_col: str = "text",
        out_col: str = "embedding",
    ):
        self.dim = dim
        self.text_col = text_col
        self.out_col = out_col
        self.model = model_factory() if model_factory is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.model is not None:
            texts = [t if t is not None else "" for t in batch[self.text_col].to_pylist()]
            M = np.asarray(self.model(texts), dtype=np.float64)
            if M.shape != (batch.num_rows, self.dim):
                raise ValueError(
                    f"model returned {M.shape}, expected {(batch.num_rows, self.dim)}"
                )
        else:
            M = hashed_trigram_embed(batch[self.text_col], self.dim)
        return batch.append_column(self.out_col, matrix_to_list_column(M))


def embed(ds, *, dim: int = 64, concurrency: int = 2, batch_size: int = 1024, **kwargs):
    """Dataset-level wrapper: streaming actor-pool embedding stage."""
    return ds.map_batches(
        Embedder,
        fn_constructor_kwargs={"dim": dim, **kwargs},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        max_restarts=0,
    )
