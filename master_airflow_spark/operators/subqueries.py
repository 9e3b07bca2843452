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
    the 100 TB form of percentiles_exact. Rows-only to the DRIVER
    (sketch estimates are engine-specific), but property-verified
    locally: tests/test_round4_ops.py::
    test_approx_percentiles_cross_engine pins every estimate within 2%
    relative of DuckDB's exact continuous quantiles — a bounded-error
    oracle, not just a row count. The sketch's array result is
    projected to three scalar columns — the driver canonicalizes
    rows-only outputs too and cannot hash array cells."""
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
    "approx_percentiles_error",
    # Same oracle strategy as approx_distinct_error (round-10 verdict
    # #7): sketch estimates are engine-specific, so the judged columns
    # are the EXACT interpolated percentiles (bit-identical to DuckDB's
    # quantile_cont — the percentiles_exact law) plus a within-bound
    # flag Spark computes from its own sketch and the oracle satisfies
    # by identity. A percentile_approx regression past 2% relative
    # error flips the flag and fails the driver's value-hash.
    oracle="""
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.50) AS p50,
       quantile_cont(o_totalprice, 0.75) AS p75,
       TRUE AS within_2pct
FROM orders
GROUP BY o_orderstatus
""",
    tags=("X6", "quality"),
)
def approx_percentiles_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-bound audit of percentile_approx: per order status, the
    exact interpolated p25/p50/p75 next to a flag asserting every
    sketch estimate landed within 2% relative of its exact
    counterpart. Exact and approximate aggregates share one groupBy
    pass; only exact values and the boolean cross the driver
    boundary, so the result hash-certifies in DuckDB while the bound
    is enforced on Spark's own sketch (the judged companion that
    upgrades rows-only ``approx_percentiles`` to a certified
    bounded-error operator)."""
    from master_airflow_spark.catalog import load_table

    o_ = F.col("o_totalprice")
    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile(o_, F.lit(0.25)).alias("p25"),
            F.percentile(o_, F.lit(0.50)).alias("p50"),
            F.percentile(o_, F.lit(0.75)).alias("p75"),
            F.percentile_approx(o_, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(10000)).alias("ap"),
        )
    )

    def _ok(exact, idx):
        # Zero-exact guard (same as hll_sketch_error): relative error
        # is undefined at exact == 0, and 0/0 would yield NULL and
        # flip the judged flag on a corpus where a percentile lands on
        # zero. Degenerate case passes iff the estimate is exactly 0.
        a = F.element_at("ap", idx).cast("double")
        return F.when(F.col(exact) == 0, a == 0).otherwise(
            F.abs(a - F.col(exact)) / F.abs(F.col(exact)) <= F.lit(0.02)
        )

    return agg.select(
        "o_orderstatus",
        "p25",
        "p50",
        "p75",
        (_ok("p25", 1) & _ok("p50", 2) & _ok("p75", 3)).alias("within_2pct"),
    )


@register(
    "surrogate_keys",
    oracle="""
SELECT row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS surrogate_id,
       o_orderkey, o_orderdate
FROM orders
""",
    tags=("X32", "X8"),
)
def surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERIAL-pk parity (reference test_dag_postgres.py:18): surrogate
    ids over a TOTAL order — deterministic, unlike
    monotonically_increasing_id whose values depend on partitioning
    (mid is the right tool when ids only need uniqueness; this is the
    reproducible-build form).

    Distributed two-phase assignment, NOT a global window (which
    funnels every row through one partition): bucket on a DETERMINISTIC
    function of the ordering key itself (year-month of o_orderdate —
    a range bucketing whose boundaries are data values, not sampled
    exchange boundaries), number rows within each bucket, then add the
    bucket-size prefix offsets (a #buckets-row aggregate, window-summed
    and broadcast back). Because the bucket id is a pure column
    expression, the offsets branch and the probe branch can each
    recompute from the scan with no shared-materialization contract —
    unlike spark_partition_id over repartitionByRange, whose sampled
    boundaries can differ between independent physical executions and
    silently corrupt the offset arithmetic. Bucket count grows with the
    date span (~84 months at TPC-H) and dates are uniform, so the sort
    stays fully parallel and skew-bounded at any scale; a deployment
    with a narrower key range picks a finer bucket expression."""
    from pyspark.sql import Window

    from master_airflow_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    bucketed = o.withColumn(
        "bkt", F.year("o_orderdate") * 12 + F.month("o_orderdate")
    )
    local_w = Window.partitionBy("bkt").orderBy("o_orderdate", "o_orderkey")
    offsets_w = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = (
        bucketed.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("offset", F.coalesce(F.sum("n").over(offsets_w), F.lit(0)))
        .select("bkt", "offset")
    )
    return (
        bucketed.withColumn("rn", F.row_number().over(local_w))
        .join(F.broadcast(offsets), "bkt")
        .select(
            (F.col("offset") + F.col("rn")).cast("int").alias("surrogate_id"),
            "o_orderkey",
            "o_orderdate",
        )
    )
