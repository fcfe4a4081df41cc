"""End-to-end multimodal feature-extraction pipeline over the synthetic
spans table (decode stubbed with the deterministic fake)."""

import glob

import numpy as np

from zparse_ray.stages.multimodal import MEDIA_FEATURES_SCHEMA, extract_media_features
from zparse_ray.synth import SynthConfig, ensure_dataset


def test_media_pipeline(ray_session):
    import ray.data as rd

    d = ensure_dataset(SynthConfig(n_docs=400, n_partitions=2, seed=31))
    spans = rd.read_parquet(sorted(glob.glob(d + "/spans/*.parquet")))
    feats = extract_media_features(spans, decoder="fake", batch_size=64, concurrency=2)
    t = feats.to_pandas()
    assert len(t) > 0
    assert set(t.columns) == set(MEDIA_FEATURES_SCHEMA.names)
    # one row per distinct asset
    assert t["asset_id"].is_unique or len(t) == len(t.drop_duplicates(["asset_id", "kind"]))
    # features are unit-norm float32 vectors
    f = np.array(t["feature"].iloc[0])
    assert abs(np.linalg.norm(f) - 1.0) < 1e-4
    assert (t["width"] >= 32).all() and (t["height"] >= 32).all()
    assert (t.loc[t["kind"] == "audio", "n_frames"] >= 1).all()


def test_resizer_aspect_preserving_and_stub():
    import numpy as np
    import pyarrow as pa
    import pytest

    from zparse_ray.stages.multimodal import MediaResizer

    b = pa.table(
        {
            "asset_id": pa.array(["a", "b", "c"]),
            "kind": pa.array(["image", "image", "image"]),
            "width": pa.array([1920, 100, 448], pa.int32()),
            "height": pa.array([1080, 400, 224], pa.int32()),
        }
    )
    out = MediaResizer(target_w=224, target_h=224, decoder="fake")(b)
    rw, rh = out["resized_w"].to_pylist(), out["resized_h"].to_pylist()
    assert rw[0] == 224 and rh[0] == 126          # landscape fits width
    assert rh[1] == 224 and rw[1] == 56           # portrait fits height
    assert rw[2] == 224 and rh[2] == 112          # exact halving
    assert all(w <= 224 and h <= 224 for w, h in zip(rw, rh))
    with pytest.raises(NotImplementedError):
        MediaResizer(decoder=None)(b)


def test_frame_sampler_stride_and_cap():
    import pyarrow as pa

    from zparse_ray.stages.multimodal import FrameSampler

    b = pa.table(
        {
            "asset_id": pa.array(["x", "y"]),
            "n_frames": pa.array([25, 900], pa.int32()),
        }
    )
    out = FrameSampler(every_n=10, max_frames=5, frame_ms=40)(b)
    rows = out.to_pylist()
    xs = [r for r in rows if r["asset_id"] == "x"]
    ys = [r for r in rows if r["asset_id"] == "y"]
    assert [r["frame_idx"] for r in xs] == [0, 10, 20]
    assert len(ys) == 5  # capped
    assert ys[1]["t_offset_ms"] == 400


def test_png_codec_round_trip_all_filters():
    import numpy as np

    from zparse_ray.functions.png_codec import PngError, decode_png, encode_png

    rng = np.random.default_rng(5)
    for shape in [(7, 5), (16, 9, 3), (4, 4, 4), (1, 1), (2, 3, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            w, h, back = decode_png(encode_png(img, filter_type=ft))
            assert (w, h) == (shape[1], shape[0])
            assert back.shape == img.shape and (back == img).all(), (shape, ft)
    # corrupt CRC rejected
    import pytest

    data = bytearray(encode_png(rng.integers(0, 256, (4, 4), dtype=np.uint8)))
    data[-5] ^= 0xFF
    with pytest.raises(PngError):
        decode_png(bytes(data))
    with pytest.raises(PngError):
        decode_png(b"not a png at all")


def test_media_extractor_png_decoder_real_pixels():
    import numpy as np
    import pyarrow as pa

    from zparse_ray.functions.png_codec import encode_png
    from zparse_ray.stages.multimodal import MediaFeatureExtractor

    # flat grey 100 image: pooled features are equal, and the stage
    # unit-normalizes, so every entry must be 1/sqrt(64) = 1/8
    img = np.full((16, 16), 100, dtype=np.uint8)
    batch = pa.table(
        {
            "asset_id": pa.array(["a1"], pa.string()),
            "kind": pa.array(["image"], pa.string()),
            "payload": pa.array([encode_png(img)], pa.binary()),
        }
    )
    out = MediaFeatureExtractor(decoder="png")(batch)
    assert out["width"][0].as_py() == 16 and out["height"][0].as_py() == 16
    feats = np.asarray(out["feature"][0].as_py())
    assert np.allclose(feats, 1 / 8)
    assert out["n_frames"][0].as_py() == 1


def test_png_decoder_tiny_image_features_finite():
    import numpy as np
    import pyarrow as pa

    from zparse_ray.functions.png_codec import PngError, decode_png, encode_png
    from zparse_ray.stages.multimodal import MediaFeatureExtractor

    # image smaller than the 8x8 pooling grid must not produce NaNs
    img = np.full((2, 3), 50, dtype=np.uint8)
    batch = pa.table(
        {
            "asset_id": pa.array(["t"], pa.string()),
            "kind": pa.array(["image"], pa.string()),
            "payload": pa.array([encode_png(img)], pa.binary()),
        }
    )
    f = np.asarray(MediaFeatureExtractor(decoder="png")(batch)["feature"][0].as_py())
    assert np.isfinite(f).all()
    # truncation inside the CRC field classifies as PngError, not struct.error
    import pytest

    with pytest.raises(PngError):
        decode_png(encode_png(img)[:-2])


# -- WAV codec (real audio path) -------------------------------------------


def test_wav_round_trip_mono_and_stereo():
    import numpy as np

    from zparse_ray.functions.wav_codec import decode_wav, encode_wav

    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32768, 777, dtype=np.int16)
    rate, n_ch, out = decode_wav(encode_wav(mono, sample_rate=22050))
    assert (rate, n_ch) == (22050, 1)
    assert (out[:, 0] == mono).all()

    stereo = rng.integers(-32768, 32768, (500, 2), dtype=np.int16)
    rate, n_ch, out = decode_wav(encode_wav(stereo, sample_rate=8000))
    assert (rate, n_ch) == (8000, 2)
    assert (out == stereo).all()


def test_wav_errors_classify():
    import numpy as np
    import pytest

    from zparse_ray.functions.wav_codec import WavError, decode_wav, encode_wav

    with pytest.raises(WavError):
        decode_wav(b"not a riff header at all")
    with pytest.raises(WavError):
        encode_wav(np.zeros(10, dtype=np.float32))  # not int16
    good = encode_wav(np.zeros(100, dtype=np.int16))
    with pytest.raises(WavError):
        decode_wav(good[:40])  # truncated inside the data chunk


def test_media_feature_extractor_wav_path():
    import numpy as np
    import pyarrow as pa

    from zparse_ray.functions.wav_codec import encode_wav
    from zparse_ray.stages.multimodal import MediaFeatureExtractor

    rng = np.random.default_rng(11)
    lens, rates = [64, 3000], [16000, 44100]
    payloads = [
        encode_wav(rng.integers(-32768, 32768, n, dtype=np.int16), sample_rate=r)
        for n, r in zip(lens, rates)
    ]
    batch = pa.table(
        {
            "asset_id": pa.array(["a0", "a1"], pa.string()),
            "kind": pa.array(["audio", "audio"], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    out = MediaFeatureExtractor(decoder="wav")(batch)
    assert out["n_frames"].to_pylist() == lens
    assert out["width"].to_pylist() == rates       # sample rate
    assert out["height"].to_pylist() == [1, 1]     # channels
    feats = np.array(out["feature"].to_pylist())
    # unit-normalized non-zero envelope
    assert np.allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-5)
