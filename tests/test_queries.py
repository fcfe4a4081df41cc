"""Driver-contract queries: spot-check a representative subset against
DuckDB at sf0.001 (the full sf0.01 sweep lives in
tools/check_queries.py and the driver's own harness)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

CHECKED = [
    "q1_pricing_summary",
    "top_customers",
    "events_props_extract",
    "events_sessionize",
    "token_counts",
    "exact_dedup",
    "ann_topk",
    "passage_repeats",
    "pack_conservation",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(ray_session, con, name):
    from zparse_ray.pipelines import driver_queries as dq

    mine = dq.queries()[name](SF_DIR)
    if isinstance(mine, pa.Table):
        mine = mine.to_pandas()
    oracle = con.execute(dq.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(
        canon(mine), canon(oracle), check_dtype=False, rtol=0, atol=1e-9
    )


def test_median_value_by_type_matches_oracle(ray_session, con):
    """median_value_by_type is retired from the driver registry (it was
    the 51st oracle-backed entry and the driver caps its CORRECTNESS
    run at 50) — its exact-median parity is pinned here instead."""
    from zparse_ray.pipelines import driver_queries as dq

    mine = dq.median_value_by_type(SF_DIR).to_pandas()
    oracle = con.execute(dq._MEDIAN_SQL).df()
    pd.testing.assert_frame_equal(
        canon(mine), canon(oracle), check_dtype=False, rtol=0, atol=1e-9
    )


@pytest.mark.parametrize("name,sql_attr", [
    ("orders_status_priority", "_ORDERS_SQL"),
    ("events_daily_counts", "_DAILY_SQL"),
    ("hll_cardinality", "_HLL_SQL"),
    ("tdigest_quantiles", "_TDIGEST_SQL"),
    # r5 retirements: slots freed for minhash_lsh_neardup /
    # media_features; the global-distinct / keyed-count machinery stays
    # driver-checked via hll_users_by_type, value_stats_by_type, q1
    ("distinct_counts", "_DISTINCT_SQL"),
    ("events_per_type", "_PERTYPE_SQL"),
])
def test_retired_registry_queries_match_oracle(ray_session, con, name, sql_attr):
    """orders_status_priority / events_daily_counts were retired from
    the 50-slot driver registry in favor of repetition_stats /
    decontam_exact (their keyed count+sum machinery stays
    driver-checked via q1_pricing_summary / events_per_type) — their
    oracle parity is pinned here instead, per the
    median_value_by_type precedent."""
    from zparse_ray.pipelines import driver_queries as dq

    mine = getattr(dq, name)(SF_DIR)
    if isinstance(mine, pa.Table):
        mine = mine.to_pandas()
    elif not isinstance(mine, pd.DataFrame):
        mine = pd.DataFrame(mine.take_all())
    oracle = con.execute(getattr(dq, sql_attr)).df()
    pd.testing.assert_frame_equal(
        canon(mine), canon(oracle), check_dtype=False, rtol=0, atol=1e-9
    )


def test_registry_consistency():
    from zparse_ray.pipelines import driver_queries as dq

    qs, sqls = dq.queries(), dq.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 30
    # the driver checks ~50 queries in registry order (CORRECTNESS_r03
    # dropped 4 oracle-backed ones past that cap — VERDICT r3 item 1):
    # every oracle-backed query must PRECEDE every rows-only one, and
    # the oracle-backed block must fit the cap
    names = list(qs)
    first_rows_only = next(
        (i for i, k in enumerate(names) if k not in sqls), len(names)
    )
    stragglers = [k for k in names[first_rows_only:] if k in sqls]
    assert not stragglers, f"oracle-backed after rows-only: {stragglers}"
    assert len(sqls) <= 50, "oracle-backed block exceeds the driver's ~50-query cap"
