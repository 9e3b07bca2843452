"""Outer-join closure (X1 completion): right and full outer joins with
null-completion semantics, over per-nation aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.registry import register


@register(
    "full_outer_nation_presence",
    oracle="""
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_customers
           FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
           FROM supplier GROUP BY 1)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(c.n_customers, 0) AS n_customers,
       coalesce(s.n_suppliers, 0) AS n_suppliers,
       (c.nk IS NOT NULL AND s.nk IS NOT NULL) AS has_both
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""",
    tags=("X1",),
)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of customer-presence vs supplier-presence per
    nation: nations with only one side survive with zero-filled
    counts. Aggregate-then-join: the outer join runs over ≤25-row
    inputs, not the fact tables."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    j = c.alias("c").join(s.alias("s"), F.col("c.nk") == F.col("s.nk"), "full_outer")
    return j.select(
        F.coalesce(F.col("c.nk"), F.col("s.nk")).alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        (F.col("c.nk").isNotNull() & F.col("s.nk").isNotNull()).alias("has_both"),
    )


@register(
    "right_join_parts_lineitems",
    oracle="""
SELECT p.p_partkey, p.p_name,
       count(l.l_orderkey) AS n_lineitems
FROM lineitem l
RIGHT JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_partkey, p.p_name
""",
    tags=("X1",),
)
def right_join_parts_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every part survives, unsold parts count 0."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey", "p_name")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
    )
