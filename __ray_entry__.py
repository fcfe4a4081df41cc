"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship validation pipeline; ``queries()`` /
``oracle_sql()`` expose each implemented operator from SURVEY.md §2
over the TPC-H-ish parquet tables for the DuckDB correctness gate.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() anywhere in the call graph.
"""

from __future__ import annotations

import shutil
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: synthesize the interleaved spans table (input_hint
    shape, sf0.001-scale), run the full validation pipeline (grammar +
    span-order + ref-integrity + uniqueness + stats + round-trip), and
    return the per-partition verdicts table."""
    import pyarrow.parquet as pq

    from zparse_ray.pipelines.validate import run_validation
    from zparse_ray.synth import SynthConfig, ensure_dataset

    cfg = SynthConfig(n_docs=2_000, n_partitions=4, seed=42)
    spans_dir = ensure_dataset(cfg)
    out_dir = "/tmp/zparse_ray_entry_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    res = run_validation(spans_dir, out_dir, round_trip=True)
    return pq.read_table(res["verdicts_path"])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from zparse_ray.pipelines import driver_queries

    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (column names
    matched exactly); non-SQL-expressible ops are omitted here and get
    the driver's rows-only check."""
    from zparse_ray.pipelines import driver_queries

    return driver_queries.oracle_sql()
