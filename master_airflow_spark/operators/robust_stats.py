"""Robust statistics (SURVEY.md §2.7 X29): exact medians, MAD-based
outlier flags, winsorized means, and exact latency percentiles — all
computed on integer cents / dyadic-exact values so Spark's parallel
aggregation and DuckDB's sequential fold agree bit-for-bit.

Split out of stats.py in round 5 (pure move; registrations, oracles,
and semantics unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.registry import register

@register(
    "mad_robust_outliers",
    oracle="""
WITH cents AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
    FROM orders
),
med AS (
    SELECT o_orderpriority, quantile_cont(price_c, 0.5) AS med_c
    FROM cents GROUP BY o_orderpriority
),
dev AS (
    SELECT c.o_orderpriority, c.price_c, m.med_c,
           abs(c.price_c - m.med_c) AS adev
    FROM cents c JOIN med m USING (o_orderpriority)
),
mad AS (
    SELECT o_orderpriority, quantile_cont(adev, 0.5) AS mad_c
    FROM dev GROUP BY o_orderpriority
)
SELECT d.o_orderpriority,
       count(*) AS n_orders,
       any_value(d.med_c) AS median_cents,
       any_value(m.mad_c) AS mad_cents,
       CAST(count_if(d.adev > 3 * 1.4826 * m.mad_c) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (o_orderpriority)
GROUP BY d.o_orderpriority
""",
    tags=("X29", "X5", "quality"),
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per priority group: median absolute
    deviation with the 1.4826 normal-consistency factor (the
    rank-based alternative to mean±3σ that heavy tails can't drag).

    Determinism: prices become integer CENTS first, so the exact
    interpolated medians (lower + 0.5·(upper−lower)) are sums of
    halves/quarters — exactly representable doubles, bit-identical
    between Spark's percentile() and DuckDB's quantile_cont(). The
    only inexact step is the final 3·1.4826·mad product, identical
    one-rounding arithmetic in both engines. Exact percentile needs a
    per-group sort: both passes shuffle on the SAME group key (5
    groups here; at scale the second pass reuses the first's
    partitioning), and medians-of-medians / sketches are the
    documented relaxation when a group no longer fits a partition."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    med = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(price_c, 0.5)").alias("med_c")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").withColumn(
        "adev", F.abs(F.col("price_c") - F.col("med_c"))
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_c")
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.any_value("med_c").alias("median_cents"),
            F.any_value("mad_c").alias("mad_cents"),
            F.count_if(
                F.col("adev") > F.lit(3) * F.lit(1.4826) * F.col("mad_c")
            ).alias("n_outliers"),
        )
    )


@register(
    "winsorized_mean_price",
    oracle="""
WITH cents AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
    FROM orders
),
bounds AS (
    SELECT o_orderpriority,
           quantile_cont(price_c, 0.05) AS lo,
           quantile_cont(price_c, 0.95) AS hi
    FROM cents GROUP BY o_orderpriority
)
SELECT c.o_orderpriority,
       count(*) AS n_orders,
       CAST(count_if(c.price_c < b.lo) AS BIGINT) AS n_floor_clipped,
       CAST(count_if(c.price_c > b.hi) AS BIGINT) AS n_ceil_clipped,
       CAST(SUM(CAST(greatest(least(CAST(c.price_c AS DOUBLE), b.hi), b.lo)
                     AS DECIMAL(28,4))) AS DOUBLE) / count(*) AS winsorized_mean_c
FROM cents c JOIN bounds b USING (o_orderpriority)
GROUP BY c.o_orderpriority
""",
    tags=("X29", "X5"),
)
def winsorized_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clipped) mean order price per priority — the
    robust location estimate that tames heavy tails without discarding
    rows (trimming changes the denominator; winsorizing clamps). Same
    exactness recipe as mad_robust_outliers: integer cents make the
    interpolated percentile boundaries exactly-representable doubles,
    clamped values are quarters at worst, and the clamped sum goes
    through DECIMAL so parallel combine order cannot perturb it. Two
    passes over the group (boundary discovery, then clamp+mean), both
    shuffling on the same key; the boundary table broadcasts."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    bounds = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(price_c, 0.05)").alias("lo"),
        F.expr("percentile(price_c, 0.95)").alias("hi"),
    )
    clamped = F.greatest(
        F.least(F.col("price_c").cast("double"), F.col("hi")), F.col("lo")
    )
    return (
        o.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_if(F.col("price_c") < F.col("lo")).alias("n_floor_clipped"),
            F.count_if(F.col("price_c") > F.col("hi")).alias("n_ceil_clipped"),
            (
                F.sum(clamped.cast("decimal(28,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("winsorized_mean_c"),
        )
    )


@register(
    "shipping_latency_percentiles",
    oracle="""
WITH lat AS (
    SELECT o.o_orderpriority,
           date_diff('day', CAST(o.o_orderdate AS DATE),
                     CAST(l.l_shipdate AS DATE)) AS latency_days
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderpriority,
       count(*) AS n_items,
       quantile_cont(latency_days, 0.5) AS p50_latency_days,
       quantile_cont(latency_days, 0.75) AS p75_latency_days,
       max(latency_days) AS max_latency_days,
       CAST(count_if(latency_days > 60) AS DOUBLE) / count(*) AS slow_frac
FROM lat
GROUP BY o_orderpriority
""",
    tags=("X29", "X14", "X5", "X1"),
)
def shipping_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-latency SLO report per order priority: exact
    p50/p75 of order→ship latency plus the slow-shipment fraction
    (>60 days). Latencies are integer DAYS and the quantile fractions
    are dyadic (1/2, 3/4), so interpolated percentiles are exact
    multiples of 1/4 — representable doubles that both engines hit
    bit-identically REGARDLESS of interpolation formula (lower+frac·Δ
    vs (1−frac)·lower+frac·upper agree exactly on exact operands; an
    inexact fraction like 0.9 would reopen ulp divergence). One
    fact-fact join on the order key, one shuffle on the 5-value
    priority key; exact percentile needs the per-group sort, same
    posture note as mad_robust_outliers."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = li.join(o, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("latency_days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.expr("percentile(latency_days, 0.5)").alias("p50_latency_days"),
        F.expr("percentile(latency_days, 0.75)").alias("p75_latency_days"),
        F.max("latency_days").alias("max_latency_days"),
        (F.count_if(F.col("latency_days") > 60).cast("double") / F.count(F.lit(1))).alias(
            "slow_frac"
        ),
    )
