"""Multimodal span processing: decode / feature-extract / resize /
frame-sample for image/audio spans.

Media payloads are opaque ``binary`` payloads referenced by
``media_ref`` with typed metadata. The Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and tested; the
codec calls themselves are STUBBED behind ``decoder=`` because no
image/audio libraries ship in this container:

- ``decoder=None`` (default) raises NotImplementedError at decode time
  (the honest stub)
- ``decoder="fake"`` uses a deterministic fake (seeded from the asset
  id) so the full pipeline shape can run and be tested
- ``decoder="png"`` is a REAL codec path: the batch must carry a
  ``payload`` binary column holding PNG bytes, decoded per row with the
  engine's own pure-stdlib codec (functions/png_codec.py) — width /
  height come from the actual IHDR and the feature vector is an 8x8
  mean-pooled greyscale grid of the actual pixels
- ``decoder="wav"`` is the REAL audio path (functions/wav_codec.py,
  stdlib ``wave``): the ``payload`` column holds 16-bit PCM WAV bytes;
  width carries the sample rate, height the channel count, n_frames
  the frame count, and the feature vector is a mean-pooled
  absolute-amplitude envelope

Scale notes: media batches are LARGE per row — callers must size
``batch_size`` small (e.g. 64) and keep ``batch_format="pyarrow"`` so
binary payloads never round-trip through pandas object dtype. One
actor per GPU/worker via ``concurrency=N, num_cpus=c`` mirrors a real
model-inference stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.sketches import hash64

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("asset_id", pa.string()),
        ("kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)


def _fake_decode(asset_ids: np.ndarray, kinds: np.ndarray, feat_dim: int):
    """Deterministic fake decoder: dimensions and features are pure
    functions of the asset id (stable across runs and workers)."""
    h = hash64(asset_ids.astype(object))
    width = (h % np.uint64(1920)).astype(np.int32) + 32
    height = ((h >> np.uint64(16)) % np.uint64(1080)).astype(np.int32) + 32
    n_frames = np.where(kinds == "audio", ((h >> np.uint64(32)) % np.uint64(900)).astype(np.int32) + 1, 1)
    feats = np.empty((len(h), feat_dim), dtype=np.float32)
    for i, seed in enumerate(h):
        feats[i] = np.random.default_rng(int(seed)).standard_normal(feat_dim, dtype=np.float32)
    return width, height, n_frames.astype(np.int32), feats


class MediaFeatureExtractor:
    """Actor-pool stage over media spans: (asset_id, kind) in ->
    decoded metadata + a unit-norm feature vector out.

    Real deployment: ``__init__`` loads the decoder + model weights once
    per actor; ``__call__`` runs batched inference. Here the decode is
    stubbed (see module docstring) but everything around it is real.
    """

    def __init__(self, decoder: str | None = None, feat_dim: int = 64):
        if decoder not in (None, "fake", "png", "wav"):
            raise ValueError(f"unknown decoder: {decoder!r}")
        self.decoder = decoder
        self.feat_dim = feat_dim
        # real version: self.model = load_model(...); torch.no_grad() etc.

    def _png_decode(self, batch: pa.Table, feat_dim: int):
        """Real decode: per-row PNG parse (actor-pool stage — the
        per-row loop IS the codec; parallelism comes from actors)."""
        from ..functions.png_codec import decode_png

        payloads = batch["payload"]
        n = batch.num_rows
        side = max(1, int(np.sqrt(feat_dim)))
        width = np.empty(n, np.int32)
        height = np.empty(n, np.int32)
        feats = np.empty((n, feat_dim), np.float32)
        for i in range(n):
            w, h, arr = decode_png(payloads[i].as_py())
            width[i], height[i] = w, h
            grey = arr.astype(np.float32)
            if grey.ndim == 3:
                grey = grey.mean(axis=2)
            # mean-pool onto at most a side x side grid; images smaller
            # than the grid use one cell per pixel row/col (an empty
            # split chunk would mean() to NaN and poison the vector)
            sy, sx = min(side, grey.shape[0]), min(side, grey.shape[1])
            pooled = np.array(
                [
                    [c.mean() for c in np.array_split(r, sx, axis=1)]
                    for r in np.array_split(grey, sy, axis=0)
                ],
                dtype=np.float32,
            ).ravel()
            feats[i, : len(pooled)] = pooled / 255.0
            feats[i, len(pooled) :] = 0.0
        return width, height, np.ones(n, np.int32), feats

    def _wav_decode(self, batch: pa.Table, feat_dim: int):
        """Real audio decode: per-row WAV parse (actor-pool stage — the
        per-row loop IS the codec). Output mapping: width=sample rate,
        height=channel count, n_frames=frame count; the feature is a
        mean-pooled absolute-amplitude envelope over feat_dim segments
        of the first channel, scaled to [0, 1]."""
        from ..functions.wav_codec import decode_wav

        payloads = batch["payload"]
        n = batch.num_rows
        width = np.empty(n, np.int32)
        height = np.empty(n, np.int32)
        n_frames = np.empty(n, np.int32)
        feats = np.zeros((n, feat_dim), np.float32)
        for i in range(n):
            rate, n_ch, samples = decode_wav(payloads[i].as_py())
            width[i], height[i], n_frames[i] = rate, n_ch, samples.shape[0]
            if samples.shape[0]:
                env = np.abs(samples[:, 0].astype(np.float32)) / 32768.0
                seg = np.array_split(env, min(feat_dim, len(env)))
                pooled = np.array([s.mean() for s in seg], dtype=np.float32)
                feats[i, : len(pooled)] = pooled
        return width, height, n_frames, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder is None:
            raise NotImplementedError(
                "media decode requires an image/audio codec, none available "
                "in this environment — construct with decoder='fake' for the "
                "deterministic stub, or decoder='png'/'wav' with a payload column"
            )
        ids = batch["asset_id"].to_numpy(zero_copy_only=False)
        kinds = batch["kind"].to_numpy(zero_copy_only=False)
        if self.decoder == "png":
            width, height, n_frames, feats = self._png_decode(batch, self.feat_dim)
        elif self.decoder == "wav":
            width, height, n_frames, feats = self._wav_decode(batch, self.feat_dim)
        else:
            width, height, n_frames, feats = _fake_decode(ids, kinds, self.feat_dim)
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        feats = feats / norms
        return pa.table(
            {
                "asset_id": batch["asset_id"],
                "kind": batch["kind"],
                "width": pa.array(width, pa.int32()),
                "height": pa.array(height, pa.int32()),
                "n_frames": pa.array(n_frames, pa.int32()),
                "feature": pa.array(list(feats), pa.list_(pa.float32())),
            },
            schema=MEDIA_FEATURES_SCHEMA,
        )


def media_spans_of(batch: pa.Table) -> pa.Table:
    """Project the interleaved spans table down to its media spans:
    one row per (asset ref) — the input of the feature extractor."""
    spans = batch["spans"].combine_chunks()
    sv = spans.values
    kinds = sv.field("kind").to_numpy(zero_copy_only=False)
    refs = sv.field("media_ref").to_numpy(zero_copy_only=False)
    mask = (kinds == "image") | (kinds == "audio")
    return pa.table(
        {
            "asset_id": pa.array(refs[mask], pa.string()),
            "kind": pa.array(kinds[mask], pa.string()),
        }
    )


def extract_media_features(spans_ds, *, decoder: str | None = "fake", batch_size: int = 64,
                           concurrency: int = 4):
    """Pipeline: spans table -> media projection -> deduped assets ->
    actor-pool feature extraction. Returns a Dataset with
    MEDIA_FEATURES_SCHEMA."""
    media = spans_ds.map_batches(media_spans_of, batch_format="pyarrow")
    # dedupe assets before the expensive decode (hash-partition first)
    from ray.data.aggregate import Count

    uniq = media.groupby(["asset_id", "kind"]).aggregate(Count(alias_name="_n")).drop_columns(["_n"])
    return uniq.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


RESIZED_SCHEMA = pa.schema(
    [
        ("asset_id", pa.string()),
        ("kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("resized_w", pa.int32()),
        ("resized_h", pa.int32()),
        ("scale_x1000", pa.int32()),
    ]
)

FRAMES_SCHEMA = pa.schema(
    [
        ("asset_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("t_offset_ms", pa.int32()),
    ]
)


class MediaResizer:
    """Actor-pool stage: aspect-preserving fit of decoded media into a
    (target_w, target_h) box. The arithmetic (integer, floor, min-scale)
    is the real plumbing; the pixel resample itself is the stubbed codec
    call (``decoder='fake'`` skips it, ``decoder=None`` raises)."""

    def __init__(self, target_w: int = 224, target_h: int = 224, decoder: str | None = None):
        if decoder not in (None, "fake"):
            raise ValueError(f"unknown decoder: {decoder!r}")
        self.tw, self.th = target_w, target_h
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder is None:
            raise NotImplementedError(
                "media resize requires an image codec, none available in this "
                "environment — construct with decoder='fake' for the stub"
            )
        w = batch["width"].to_numpy().astype(np.float64)
        h = batch["height"].to_numpy().astype(np.float64)
        scale = np.minimum(self.tw / np.maximum(w, 1), self.th / np.maximum(h, 1))
        scale = np.minimum(scale, 1.0)  # never upscale
        rw = np.maximum((w * scale).astype(np.int32), 1)
        rh = np.maximum((h * scale).astype(np.int32), 1)
        return pa.table(
            {
                "asset_id": batch["asset_id"],
                "kind": batch["kind"],
                "width": batch["width"],
                "height": batch["height"],
                "resized_w": pa.array(rw, pa.int32()),
                "resized_h": pa.array(rh, pa.int32()),
                "scale_x1000": pa.array((scale * 1000).astype(np.int32), pa.int32()),
            },
            schema=RESIZED_SCHEMA,
        )


class FrameSampler:
    """Actor-pool stage: expand each multi-frame asset into one row per
    SAMPLED frame (every_n stride, capped at max_frames) — the
    flat_map-shaped stage a video/audio feature pipeline needs. Frame
    timestamps assume a fixed frame interval (the stub decoder's
    metadata); output rows are tiny, so expansion is safe upstream of a
    per-frame inference stage."""

    def __init__(self, every_n: int = 10, max_frames: int = 32, frame_ms: int = 40):
        self.every_n = max(1, every_n)
        self.max_frames = max_frames
        self.frame_ms = frame_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["asset_id"].to_numpy(zero_copy_only=False)
        n_frames = batch["n_frames"].to_numpy()
        out_ids, out_idx = [], []
        for aid, n in zip(ids, n_frames):
            idxs = np.arange(0, int(n), self.every_n)[: self.max_frames]
            out_ids.extend([aid] * len(idxs))
            out_idx.extend(idxs)
        idx_arr = np.asarray(out_idx, dtype=np.int32)
        return pa.table(
            {
                "asset_id": pa.array(out_ids, pa.string()),
                "frame_idx": pa.array(idx_arr, pa.int32()),
                "t_offset_ms": pa.array(idx_arr * np.int32(self.frame_ms), pa.int32()),
            },
            schema=FRAMES_SCHEMA,
        )
