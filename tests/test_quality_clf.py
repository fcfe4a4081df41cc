"""Quality-classifier tests: distributed loss/grad parity vs a
single-process reference, training separates planted classes, scorer
parity, layout tolerance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from zparse_ray.stages.quality_clf import (
    QualityClassifier,
    _doc_feature_triples,
    _evaluate,
    _loss_grad_partial,
    score_quality,
    train_quality_classifier,
)

DIM = 1 << 10


def _labeled_corpus(n_good=80, n_bad=80):
    rng = np.random.default_rng(5)
    good_vocab = ["the", "quick", "brown", "fox", "reads", "fine",
                  "books", "daily", "news", "report"]
    bad_vocab = ["zzz", "click", "here", "buy", "xxx", "free", "win",
                 "$$$", "now", "spam"]
    rows = []
    for i in range(n_good):
        rows.append((i, " ".join(rng.choice(good_vocab, 12)), 1))
    for i in range(n_bad):
        rows.append((n_good + i, " ".join(rng.choice(bad_vocab, 12)), 0))
    rows.append((n_good + n_bad, "", 0))  # token-less doc: bias only
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def _reference_loss_grad(df, w, b, dim, l2):
    """Single-process reference over the same hashed features."""
    t = pa.Table.from_pandas(df, preserve_index=False)
    row_idx, feat_idx, vals, n = _doc_feature_triples(t, "text", dim)
    X = np.zeros((n, dim))
    np.add.at(X, (row_idx, feat_idx), vals)
    y = df["label"].to_numpy(dtype=np.float64)
    z = X @ w + b
    p = 1.0 / (1.0 + np.exp(-z))
    loss = float(np.sum(np.logaddexp(0.0, z) - y * z)) / n \
        + 0.5 * l2 * float(w @ w)
    grad = X.T @ (p - y) / n + l2 * w
    gbias = float(np.sum(p - y)) / n
    return loss, grad, gbias


def test_distributed_loss_grad_matches_reference(ray_session):
    import ray.data as rd

    df = _labeled_corpus()
    rng = np.random.default_rng(1)
    w, b, l2 = rng.normal(0, 0.1, DIM), 0.3, 1e-3
    loss, grad, gbias, n = _evaluate(
        rd.from_pandas(df).repartition(4), "text", "label", DIM, w, b, l2)
    rloss, rgrad, rgbias = _reference_loss_grad(df, w, b, DIM, l2)
    assert n == len(df)
    assert loss == pytest.approx(rloss, rel=1e-10)
    assert gbias == pytest.approx(rgbias, rel=1e-10)
    np.testing.assert_allclose(grad, rgrad, atol=1e-12)


def test_training_separates_planted_classes(ray_session):
    import ray.data as rd

    df = _labeled_corpus()
    ds = rd.from_pandas(df).repartition(3)
    model = train_quality_classifier(ds, "label", dim=DIM, iters=10)
    p = model.predict_proba(pa.Table.from_pandas(df, preserve_index=False))
    y = df["label"].to_numpy()
    # full separation on the training vocabulary
    assert p[y == 1].min() > 0.8
    assert p[y == 0][:-1].max() < 0.2  # exclude the empty bias-only doc
    # scorer stage matches driver-side predict
    scored = score_quality(ds, model, concurrency=2)
    got = {r["doc_id"]: r["quality_prob"]
           for r in scored.select_columns(["doc_id", "quality_prob"]).take_all()}
    for i, doc_id in enumerate(df["doc_id"]):
        assert got[doc_id] == pytest.approx(p[i], abs=1e-12)


def test_training_layout_tolerance(ray_session):
    import ray.data as rd

    df = _labeled_corpus(40, 40)
    m1 = train_quality_classifier(rd.from_pandas(df).repartition(1),
                                  "label", dim=DIM, iters=4)
    m2 = train_quality_classifier(rd.from_pandas(df).repartition(6),
                                  "label", dim=DIM, iters=4)
    # float fold order differs across layouts; weights agree to
    # summation tolerance, not bit equality
    np.testing.assert_allclose(m1.w, m2.w, atol=1e-6)
    assert m1.b == pytest.approx(m2.b, abs=1e-6)


def test_empty_dataset_raises(ray_session):
    import ray.data as rd

    empty = rd.from_pandas(pd.DataFrame({"text": pd.Series([], dtype=str),
                                         "label": pd.Series([], dtype=np.int64)}))
    with pytest.raises(ValueError, match="no rows"):
        train_quality_classifier(empty, "label", dim=DIM, iters=2)


def test_partial_shape_and_tokenless_rows():
    df = pd.DataFrame({"text": ["", "   "], "label": [0, 1]})
    t = pa.Table.from_pandas(df, preserve_index=False)
    out = _loss_grad_partial(t, column="text", label_column="label",
                             dim=DIM, wref=(np.zeros(DIM), 0.0))
    assert out.num_rows == 1
    assert out["n"][0].as_py() == 2
    # z = 0 for both -> loss = 2*log(2), gbias = (0.5-0)+(0.5-1) = 0
    assert out["loss"][0].as_py() == pytest.approx(2 * np.log(2))
    assert out["gbias"][0].as_py() == pytest.approx(0.0)
    grad = np.asarray(out["grad"][0].as_py())
    assert not grad.any()
