"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001; every
``queries()[name]`` runs at sf=0.01 and is compared against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash). Implementations live in
``master_airflow_spark/``; this module only adapts the registry to the
driver's three-function surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from master_airflow_spark.operators.topk import flagship

    return flagship(spark, SMOKE_SF_DIR)


def _released(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the PREVIOUS query's tracked caches/broadcasts before
    building the next plan. The driver materializes each query fully
    before invoking the next, so by the time this runs the prior
    query's persisted frames and broadcast blocks are consumable — this
    keeps executor/driver memory flat across the long sampling loop
    without the driver needing to know about the cache registry."""
    from master_airflow_spark import registry

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        registry.release_caches()
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from master_airflow_spark import registry

    return {name: _released(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    from master_airflow_spark import registry

    return registry.oracles()
