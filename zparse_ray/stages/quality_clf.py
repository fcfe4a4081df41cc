"""Trainable quality classifier — fastText-style hashed-feature
logistic regression over documents (the "quality classifier" of public
LLM pipelines: GPT-3/PaLM filtered web text with exactly this shape —
a linear model over hashed token n-grams, trained to separate a
trusted corpus from raw crawl).

Ray-Data-native split of work (the classic distributed-LR shape):

- **Features** (shared verbatim by train and score): the LM's
  vectorized n-gram pass (``lm_score._doc_window_hashes`` — one
  explode + shifted-array windows per batch, no per-row Python)
  produces unigram + BOS-framed bigram hashes; each buckets into half
  of a ``dim``-sized hashed feature space, values are per-doc token
  frequencies (L1-normalized counts). Token-less docs carry only the
  bias term.
- **Train** (``train_quality_classifier``): full-batch loss+gradient
  as per-batch partials — one ``bincount`` for the margins, one for
  the gradient scatter, a single (dim+2)-float row per batch — folded
  on the driver (O(n_blocks × dim) streamed floats per pass,
  documented). The driver runs L-BFGS (two-loop recursion, Armijo
  backtracking) over that oracle; each function evaluation is ONE
  streaming pass with the current weights ``ray.put`` once. At 100 TB
  you train on a bounded ``sample.hash_sample`` of the corpus (what
  fastText-style filters do) and SCORE the full corpus — scoring is
  the corpus-sized work and it is a pure per-batch map.
- **Score** (``QualityScorer``): actor-pool stage, weights fetched
  once per actor, per batch one ``bincount`` margin + sigmoid —
  appends ``quality_prob``. Zero shuffle anywhere in this module.

Determinism: features and partials are exact; the driver fold adds
per-block partials in block order, so retrainings on a different
block layout agree to float-summation tolerance (tested via allclose,
not bit equality — the honest claim for float reductions).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .lm_score import _doc_window_hashes


def _doc_feature_triples(batch: pa.Table, column: str, dim: int):
    """(row_idx, feat_idx, value) triples for the batch + n_rows.
    Unigrams hash into [0, dim/2), bigrams into [dim/2, dim); values
    are 1/n_tokens per occurrence (L1 token-frequency normalization)."""
    half = dim // 2
    tri, bi, uni, row_starts, rows = _doc_window_hashes(batch, column)
    n = batch.num_rows
    if len(rows) == 0:
        e = np.zeros(0, np.int64)
        return e, e, np.zeros(0, np.float64), n
    m = np.diff(np.append(row_starts, len(uni)))  # tokens per non-empty doc
    row_of_tok = np.repeat(rows, m)
    inv_len = np.repeat(1.0 / m, m)
    f_uni = (uni % np.uint64(half)).astype(np.int64)
    f_bi = half + (bi % np.uint64(half)).astype(np.int64)
    row_idx = np.concatenate([row_of_tok, row_of_tok])
    feat_idx = np.concatenate([f_uni, f_bi])
    vals = np.concatenate([inv_len, inv_len])
    return row_idx, feat_idx, vals, n


def _margins(row_idx, feat_idx, vals, n, w, b):
    z = np.bincount(row_idx, weights=w[feat_idx] * vals, minlength=n)
    return z + b


def _loss_grad_partial(batch: pa.Table, *, column: str, label_column: str,
                       dim: int, wref) -> pa.Table:
    """One (grad[dim], gbias, loss, n) row per batch."""
    import ray

    w, b = ray.get(wref) if isinstance(wref, ray.ObjectRef) else wref
    row_idx, feat_idx, vals, n = _doc_feature_triples(batch, column, dim)
    y = batch[label_column].to_numpy(zero_copy_only=False).astype(np.float64)
    z = _margins(row_idx, feat_idx, vals, n, w, b)
    p = 1.0 / (1.0 + np.exp(-z))
    err = p - y
    # logistic loss, numerically stable: log(1+e^z) - y z
    loss = float(np.sum(np.logaddexp(0.0, z) - y * z))
    grad = np.bincount(feat_idx, weights=vals * err[row_idx], minlength=dim)
    return pa.table({
        "grad": pa.array([grad], pa.list_(pa.float64(), dim)),
        "gbias": pa.array([float(err.sum())], pa.float64()),
        "loss": pa.array([loss], pa.float64()),
        "n": pa.array([n], pa.int64()),
    })


@dataclass
class QualityClassifier:
    """Broadcastable linear model: hashed-feature weights + bias."""

    w: np.ndarray = field(default_factory=lambda: np.zeros(1))
    b: float = 0.0
    dim: int = 1 << 16

    def predict_proba(self, batch: pa.Table, column: str = "text") -> np.ndarray:
        row_idx, feat_idx, vals, n = _doc_feature_triples(batch, column,
                                                          self.dim)
        z = _margins(row_idx, feat_idx, vals, n, self.w, self.b)
        return 1.0 / (1.0 + np.exp(-z))


def _evaluate(ds, column: str, label_column: str, dim: int,
              w: np.ndarray, b: float, l2: float):
    """One streaming pass: mean loss + gradient at (w, b)."""
    import ray

    wref = ray.put((w, b))
    parts = ds.map_batches(
        _loss_grad_partial,
        fn_kwargs={"column": column, "label_column": label_column,
                   "dim": dim, "wref": wref},
        batch_format="pyarrow",
    )
    grad = np.zeros(dim)
    gbias = loss = 0.0
    n = 0
    for t in parts.iter_batches(batch_format="pyarrow"):
        g = t["grad"].combine_chunks().flatten().to_numpy().reshape(-1, dim)
        grad += g.sum(axis=0)
        gbias += float(np.sum(t["gbias"].to_numpy()))
        loss += float(np.sum(t["loss"].to_numpy()))
        n += int(np.sum(t["n"].to_numpy()))
    if n == 0:
        raise ValueError("train_quality_classifier: no rows")
    loss = loss / n + 0.5 * l2 * float(w @ w)
    grad = grad / n + l2 * w
    gbias = gbias / n
    return loss, grad, gbias, n


def train_quality_classifier(ds, label_column: str, *,
                             column: str = "text", dim: int = 1 << 16,
                             iters: int = 15, l2: float = 1e-4,
                             history: int = 8,
                             materialize_input: bool = True) -> QualityClassifier:
    """L-BFGS over the distributed loss/grad oracle. ``iters`` bounds
    the number of accepted steps; each evaluation (including the <= 4
    Armijo backtracks per step) is one streaming pass over ``ds``.
    Labels are 0/1 in ``label_column`` (1 = high quality).

    Every evaluation re-executes ``ds``'s plan, and L-BFGS makes ~2-3
    evaluations per iteration — so by default the input is
    ``materialize()``d ONCE up front (``materialize_input=True``): the
    training set is BOUNDED by contract (train on a ``hash_sample``,
    score the full corpus — the ``lm_score.train_ngram_lm`` rationale),
    so pinning its blocks in the object store is cheap and turns each
    later evaluation into a pure map over cached blocks instead of a
    read + label + sample chain re-run. Pass ``materialize_input=False``
    only when ``ds`` is already materialized or trivially cheap."""
    if materialize_input:
        ds = ds.materialize()
    d = dim + 1  # bias folded into the flat optimization vector
    x = np.zeros(d)

    def f(xv):
        loss, grad, gbias, _ = _evaluate(ds, column, label_column, dim,
                                         xv[:dim], float(xv[dim]), l2)
        return loss, np.append(grad, gbias)

    loss, grad = f(x)
    s_hist: list[np.ndarray] = []
    y_hist: list[np.ndarray] = []
    for _ in range(iters):
        # two-loop recursion
        q = grad.copy()
        alphas = []
        for s, yv in zip(reversed(s_hist), reversed(y_hist)):
            a = (s @ q) / (yv @ s)
            q -= a * yv
            alphas.append(a)
        if y_hist:
            q *= (s_hist[-1] @ y_hist[-1]) / (y_hist[-1] @ y_hist[-1])
        for (s, yv), a in zip(zip(s_hist, y_hist), reversed(alphas)):
            q += (a - (yv @ q) / (yv @ s)) * s
        direction = -q
        gd = grad @ direction
        if gd >= 0:  # not a descent direction — reset to steepest
            direction, gd = -grad, -(grad @ grad)
        step, accepted = 1.0, False
        for _ in range(4):  # Armijo backtracking
            xn = x + step * direction
            loss_n, grad_n = f(xn)
            if loss_n <= loss + 1e-4 * step * gd:
                accepted = True
                break
            step *= 0.25
        if not accepted:
            break
        s_new, y_new = xn - x, grad_n - grad
        if float(y_new @ s_new) > 1e-12:  # curvature guard (keeps the
            s_hist.append(s_new)          # two-loop denominators positive)
            y_hist.append(y_new)
        if len(s_hist) > history:
            s_hist.pop(0)
            y_hist.pop(0)
        x, loss, grad = xn, loss_n, grad_n
        if float(np.linalg.norm(grad)) < 1e-7:
            break
    return QualityClassifier(w=x[:dim], b=float(x[dim]), dim=dim)


class QualityScorer:
    """Actor-pool ``map_batches`` callable: appends ``quality_prob``
    (float64, the model's P(high quality)). ``model`` is a
    ``QualityClassifier`` or a ``ray.ObjectRef`` — fetched once per
    actor."""

    def __init__(self, model, text_col: str = "text"):
        import ray

        if isinstance(model, ray.ObjectRef):
            model = ray.get(model)
        self.model = model
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.model.predict_proba(batch, self.text_col)
        return batch.append_column("quality_prob", pa.array(p, pa.float64()))


def score_quality(ds, model: QualityClassifier, *, concurrency: int = 2,
                  **kwargs):
    """Broadcast the model once, stream the scoring stage."""
    import ray

    ref = ray.put(model)
    return ds.map_batches(
        QualityScorer,
        fn_constructor_kwargs={"model": ref, **kwargs},
        batch_format="pyarrow",
        concurrency=concurrency,
        max_restarts=0,
    )
