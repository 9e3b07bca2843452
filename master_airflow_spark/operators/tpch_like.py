"""TPC-H-shaped analytical queries adapted to the driver's star schema
— the optimizer-stress set: multi-join reordering (Q3/Q7 shapes),
conditional aggregation with ratio output (Q14), and disjunctive
multi-predicate pushdown (Q19).

All sums follow the decimal exactness recipe (functions/exact.py);
every LIMIT carries a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.functions.exact import dmul, sql_dmul
from master_airflow_spark.registry import register

_REV = "l_extendedprice", "(1 - l_discount)"


def _revenue() -> F.Column:
    return (
        F.sum(dmul(F.col("l_extendedprice"), 1 - F.col("l_discount")))
        .cast("double")
        .alias("revenue")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       CAST(SUM({sql_dmul(*_REV)}) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-03-15'
  AND l.l_shipdate  > TIMESTAMP '1997-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    tags=("X1", "X5", "T3"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: top-10 unshipped BUILDING-segment orders by revenue.
    Both date predicates push to their scans; the segment filter prunes
    customers before the fact join; TakeOrderedAndProject caps the
    sorted output at 10 rows."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_revenue())
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(year(l.l_shipdate) AS INT) AS ship_year,
       CAST(SUM({sql_dmul(*_REV)}) AS DOUBLE) AS volume
FROM lineitem l
JOIN orders o    ON o.o_orderkey = l.l_orderkey
JOIN customer c  ON c.c_custkey = o.o_custkey
JOIN supplier s  ON s.s_suppkey = l.l_suppkey
JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
WHERE cn.n_name <> sn.n_name
GROUP BY cn.n_name, sn.n_name, year(l.l_shipdate)
""",
    tags=("X1", "X5", "X14"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: cross-border trade volume per (customer nation,
    supplier nation, year). Nation joins broadcast twice under
    different aliases; the inequality predicate lands above them."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = F.broadcast(n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")))
    sn = F.broadcast(n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")))
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(cn, F.col("cnk") == c.c_nationkey)
        .join(sn, F.col("snk") == s.s_nationkey)
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(dmul(F.col("l_extendedprice"), 1 - F.col("l_discount")))
            .cast("double")
            .alias("volume")
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                               THEN {sql_dmul('l.l_extendedprice', '(1 - l.l_discount)')}
                               ELSE CAST(0 AS DECIMAL(28,8)) END) AS DOUBLE)
            / CAST(SUM({sql_dmul('l.l_extendedprice', '(1 - l.l_discount)')}) AS DOUBLE)
        AS DOUBLE) AS promo_revenue_pct,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-02-01'
""",
    tags=("X1", "X5", "X15"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share for one month — conditional
    decimal aggregation with a final double ratio (both divisions are
    single deterministic IEEE ops)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = dmul(F.col("l_extendedprice"), 1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(28,8)")
    )
    joined = li.join(p, p.p_partkey == li.l_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q19_disjunctive_filter",
    oracle=f"""
SELECT CAST(SUM({sql_dmul('l.l_extendedprice', '(1 - l.l_discount)')}) AS DOUBLE)
           AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
""",
    tags=("X1", "X5", "X15"),
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs across both join sides. Catalyst factors
    the common p_partkey join and pushes the per-side conjuncts it can
    derive (brand/size to part, quantity bounds to lineitem) — the
    disjunctive-pushdown stress case."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    j = li.join(p, p.p_partkey == li.l_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.where(cond).agg(
        F.sum(dmul(F.col("l_extendedprice"), 1 - F.col("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
