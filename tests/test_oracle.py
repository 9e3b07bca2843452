"""Differential tests: every registered query vs its DuckDB oracle.

This is the same comparison the driver performs (row-count + schema +
order-insensitive values), run at sf0.001 for speed. Queries without an
oracle get a rows-only sanity check here (dedicated semantic tests live
in their own test modules).
"""

from __future__ import annotations

import pytest

from master_airflow_spark import registry
from master_airflow_spark.testing import run_one

registry._ensure_loaded()
ALL = sorted(registry.REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, name):
    res = run_one(spark, sf_dir, name)
    assert res.ok, f"{name}: " + "; ".join(res.mismatches)
    if registry.REGISTRY[name].oracle is None:
        assert res.spark_rows >= 0
