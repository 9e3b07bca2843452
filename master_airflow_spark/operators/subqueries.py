"""Subquery closure — scalar subqueries, IN / EXISTS (correlated and
not), plus exact percentiles and surrogate-key assignment.

The reference has no subqueries (SURVEY.md §4.1: "subquery
decorrelation — n/a"); these pin Catalyst's decorrelation rewrites
(correlated EXISTS → left-semi join, scalar subquery → broadcast of a
1-row aggregate) against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from master_airflow_spark.catalog import register_views
from master_airflow_spark.registry import register


@register(
    "scalar_subquery_above_avg",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
                             / COUNT(*) FROM orders)
""",
    tags=("X5", "subquery"),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price — the scalar subquery
    becomes a 1-row broadcast, not a per-row re-aggregation. The
    average is the deterministic decimal-sum/count form."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
                   / COUNT(*) FROM orders)
        """
    )


@register(
    "correlated_exists_urgent",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
""",
    tags=("X2", "subquery"),
)
def correlated_exists_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst decorrelates to a left-semi join
    with the predicate pushed below it."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        """
    )


@register(
    "in_subquery_parts",
    oracle="""
SELECT p_partkey, p_name
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)
""",
    tags=("X2", "subquery"),
)
def in_subquery_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (uncorrelated) → left-semi join on the distinct
    probe set."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)
        """
    )


@register(
    "percentiles_exact",
    oracle="""
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.50) AS p50,
       quantile_cont(o_totalprice, 0.75) AS p75
FROM orders
GROUP BY o_orderstatus
""",
    tags=("X5",),
)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — Spark's percentile()
    and DuckDB's quantile_cont use the same lo + frac·(hi-lo) linear
    interpolation, so values match bitwise."""
    o_ = F.col("o_totalprice")
    from master_airflow_spark.catalog import load_table

    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile(o_, F.lit(0.25)).alias("p25"),
            F.percentile(o_, F.lit(0.50)).alias("p50"),
            F.percentile(o_, F.lit(0.75)).alias("p75"),
        )
    )


@register("approx_percentiles", oracle=None, tags=("X6",))
def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (KLL-style sketch): mergeable, one pass,
    the 100 TB form of percentiles_exact. Rows-only (sketch estimates
    are engine-specific). The sketch's array result is projected to
    three scalar columns — the driver canonicalizes rows-only outputs
    too and cannot hash array cells."""
    from master_airflow_spark.catalog import load_table

    pcts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", [0.25, 0.5, 0.75], 10000).alias(
                "approx_pcts"
            )
        )
    )
    return pcts.select(
        "o_orderstatus",
        F.element_at("approx_pcts", 1).alias("p25"),
        F.element_at("approx_pcts", 2).alias("p50"),
        F.element_at("approx_pcts", 3).alias("p75"),
    )


@register(
    "surrogate_keys",
    oracle="""
SELECT row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS surrogate_id,
       o_orderkey, o_orderdate
FROM orders
""",
    tags=("X8",),
)
def surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERIAL-pk parity (reference test_dag_postgres.py:18): surrogate
    ids over a TOTAL order — deterministic, unlike
    monotonically_increasing_id whose values depend on partitioning
    (mid is the right tool when ids only need uniqueness; this is the
    reproducible-build form).

    Distributed two-phase assignment, NOT a global window (which
    funnels every row through one partition): range-partition on the
    order key, number rows within each partition, then add the
    partition-size prefix offsets (a #partitions-row aggregate,
    window-summed and broadcast back). Ids depend only on the unique
    total order (o_orderdate, o_orderkey), not on where the sampled
    range boundaries land, so the result is bit-stable across cluster
    sizes while the sort stays fully parallel.

    The numbered frame is persisted (track_cache) before fanning into
    the offsets aggregate and the join probe: both branches MUST see
    one materialization of the range exchange — repartitionByRange
    samples its boundaries, so two independent physical executions
    (exchange reuse off, or future plan divergence) could place rows
    in different partitions on each side and silently corrupt the
    offset arithmetic."""
    from pyspark.sql import Window

    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.registry import track_cache

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n_parts = spark.sparkContext.defaultParallelism
    ranged = o.repartitionByRange(n_parts, "o_orderdate", "o_orderkey").withColumn(
        "pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("pid").orderBy("o_orderdate", "o_orderkey")
    local = track_cache(ranged.withColumn("rn", F.row_number().over(local_w)))
    offsets_w = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = (
        local.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("offset", F.coalesce(F.sum("n").over(offsets_w), F.lit(0)))
        .select("pid", "offset")
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            (F.col("offset") + F.col("rn")).cast("int").alias("surrogate_id"),
            "o_orderkey",
            "o_orderdate",
        )
    )
