"""Mixture-composition tests: water-filling rate resolution (pure
driver arithmetic), per-source Bernoulli parity vs the hash rule,
deterministic interleaving, schema intersection."""

import numpy as np
import pandas as pd
import pytest

from zparse_ray.pipelines.mix_corpora import (
    _source_seed,
    mix_corpora,
    resolve_rates,
)
from zparse_ray.stages.sample import _ppm_bucket


def test_resolve_rates_no_capping():
    rates, short = resolve_rates({"a": 1000, "b": 1000},
                                 {"a": 3.0, "b": 1.0}, 400)
    assert rates == {"a": 0.3, "b": 0.1}
    assert short == 0.0


def test_resolve_rates_redistributes_capped_slack():
    # 'small' can only supply 100 of its 300-token share; the 200-token
    # slack refills 'big'
    rates, short = resolve_rates({"small": 100, "big": 10_000},
                                 {"small": 1.0, "big": 1.0}, 600)
    assert rates["small"] == 1.0
    assert rates["big"] == pytest.approx(500 / 10_000)
    assert short == 0.0


def test_resolve_rates_shortfall_when_everything_exhausted():
    rates, short = resolve_rates({"a": 100, "b": 50}, {"a": 1, "b": 1}, 1000)
    assert rates == {"a": 1.0, "b": 1.0}
    assert short == pytest.approx(850)


def test_resolve_rates_zero_token_source_and_errors():
    rates, _ = resolve_rates({"a": 0, "b": 100}, {"a": 1, "b": 1}, 50)
    assert rates["a"] == 0.0 and rates["b"] == 0.5
    with pytest.raises(ValueError, match="positive"):
        resolve_rates({"a": 10}, {"a": 1.0}, 0)
    with pytest.raises(ValueError, match="weights"):
        resolve_rates({"a": 10}, {"a": -1.0}, 5)


def _corpus(n, words_per_doc, tag, extra=False):
    text = [" ".join([f"{tag}{i}w{j}" for j in range(words_per_doc)])
            for i in range(n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": text})
    if extra:
        df["lang"] = "en"
    return df


@pytest.fixture(scope="module")
def mixed(ray_session):
    import ray.data as rd

    web = _corpus(300, 20, "web", extra=True)
    code = _corpus(80, 10, "code")
    ds, stats = mix_corpora(
        {"web": rd.from_pandas(web).repartition(4),
         "code": rd.from_pandas(code).repartition(2)},
        token_budget=3000,
        weights={"web": 2.0, "code": 1.0},
        seed=7,
    )
    return web, code, ds.take_all(), stats


def test_mix_exact_totals_and_rates(mixed):
    web, code, rows, stats = mixed
    assert stats["sources"]["web"]["tokens_total"] == 300 * 20
    assert stats["sources"]["code"]["tokens_total"] == 80 * 10
    # web share 2000 of 6000 -> 1/3; code share 1000 of 800 -> capped,
    # slack 200 refills web: (2000+200)/6000
    assert stats["sources"]["code"]["epochs_whole"] == 1
    assert stats["sources"]["code"]["frac_ppm"] == 0
    assert stats["sources"]["web"]["epochs_whole"] == 0
    assert stats["sources"]["web"]["frac_ppm"] == round(2200 / 6000 * 1e6)
    assert stats["shortfall_tokens"] == 0.0


def test_mix_rows_match_per_source_hash_rule(mixed):
    web, code, rows, stats = mixed
    got = {(r["mix_source"], r["doc_id"]) for r in rows}
    want = set()
    for name, df in (("web", web), ("code", code)):
        s = stats["sources"][name]
        ppm = 1_000_000 if s["epochs_whole"] >= 1 else s["frac_ppm"]
        buck = _ppm_bucket(df["doc_id"].to_numpy(),
                           _source_seed(f"{name}#e0", 7))
        for i in df["doc_id"].to_numpy()[buck < np.uint64(ppm)]:
            want.add((name, int(i)))
    assert got == want
    assert len(got) == len(rows)  # (source, id) unique


def test_mix_schema_is_shared_columns_plus_source(mixed):
    _, _, rows, _ = mixed
    assert set(rows[0]) == {"doc_id", "text", "mix_source", "mix_epoch"}  # no 'lang'


def test_mix_interleaving_deterministic_across_layouts(ray_session):
    import ray.data as rd

    a, b = _corpus(60, 5, "a"), _corpus(40, 5, "b")

    def run(pa_, pb_):
        ds, _ = mix_corpora(
            {"a": rd.from_pandas(a).repartition(pa_),
             "b": rd.from_pandas(b).repartition(pb_)},
            token_budget=300, seed=3)
        return [(r["mix_source"], r["doc_id"]) for r in ds.take_all()]

    r1, r2 = run(1, 1), run(5, 3)
    assert r1 == r2
    assert len(r1) > 0
    srcs = {s for s, _ in r1}
    assert srcs == {"a", "b"}


def test_mix_errors(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(_corpus(5, 3, "x"))
    with pytest.raises(ValueError, match="no sources"):
        mix_corpora({}, 100)
    with pytest.raises(ValueError, match="no weight"):
        mix_corpora({"x": ds}, 100, weights={"y": 1.0})
    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([0], dtype=np.int64), "text": [""]}))
    with pytest.raises(ValueError, match="no source has tokens"):
        mix_corpora({"e": empty}, 100)


def test_mix_upsampling_epochs(ray_session):
    import ray.data as rd

    small = _corpus(30, 10, "s")   # 300 tokens
    big = _corpus(300, 10, "b")    # 3000 tokens
    ds, stats = mix_corpora(
        {"small": rd.from_pandas(small), "big": rd.from_pandas(big)},
        token_budget=2400, weights={"small": 1.0, "big": 1.0},
        max_epochs=4, seed=11)
    # small's 1200-token share = 4x its 300 tokens -> capped at 4 epochs
    s = stats["sources"]["small"]
    assert s["rate"] == 4.0 and s["epochs_whole"] == 4 and s["frac_ppm"] == 0
    assert stats["sources"]["big"]["rate"] == pytest.approx(1200 / 3000)
    rows = ds.take_all()
    got_small = [(r["mix_epoch"], r["doc_id"]) for r in rows
                 if r["mix_source"] == "small"]
    # four complete passes, each doc once per epoch
    assert len(got_small) == 4 * 30
    assert {e for e, _ in got_small} == {0, 1, 2, 3}
    # fractional source matches the per-epoch hash rule
    ppm = stats["sources"]["big"]["frac_ppm"]
    buck = _ppm_bucket(big["doc_id"].to_numpy(), _source_seed("big#e0", 11))
    want = {int(i) for i in big["doc_id"].to_numpy()[buck < np.uint64(ppm)]}
    got_big = {r["doc_id"] for r in rows if r["mix_source"] == "big"}
    assert got_big == want


def test_resolve_rates_max_epochs_validation():
    with pytest.raises(ValueError, match="max_epochs"):
        resolve_rates({"a": 10}, {"a": 1.0}, 5, max_epochs=0)


def test_mix_rejects_helper_column_collisions(ray_session):
    """Inputs already carrying _mix_h / mix_source / mix_epoch would get
    DUPLICATE Arrow column names (silent sort-key corruption) — refuse
    loudly instead (ADVICE r4, the grouped_cap_sample guard precedent)."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from zparse_ray.pipelines.mix_corpora import mix_corpora

    def mk(extra=None):
        df = pd.DataFrame({
            "doc_id": np.arange(5, dtype=np.int64),
            "text": ["one two three"] * 5,
        })
        if extra:
            df[extra] = 0
        return rd.from_pandas(df)

    for bad in ("_mix_h", "mix_source", "mix_epoch"):
        with pytest.raises(ValueError, match="collide"):
            mix_corpora({"a": mk(bad), "b": mk()}, token_budget=10)
    # custom tag names shift the guard with them
    with pytest.raises(ValueError, match="collide"):
        mix_corpora({"a": mk("origin")}, token_budget=10,
                    source_column="origin")
