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
