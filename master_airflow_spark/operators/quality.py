"""Data-quality expectation checks — the validation stage a scheduled
ingestion pipeline runs before publishing a batch (the reference
validates nothing; rows go straight from scrape to sinks).

One row per named expectation: violation count + pass flag. All checks
are single aggregates or anti-join counts, so the whole suite is a few
scans — at 100 TB each check is a pushdown-friendly aggregate, and the
result table is the thing a pipeline gate alerts on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.registry import register


@register(
    "dq_checks",
    oracle="""
SELECT 'lineitem_null_keys' AS check_name,
       count(*) FILTER (WHERE l_orderkey IS NULL OR l_partkey IS NULL) AS n_violations
FROM lineitem
UNION ALL
SELECT 'lineitem_nonpositive_price',
       count(*) FILTER (WHERE l_extendedprice <= 0)
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_range',
       count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.5)
FROM lineitem
UNION ALL
SELECT 'orphan_lineitems',
       count(*)
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orphan_orders',
       count(*)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'events_bad_json',
       count(*) FILTER (WHERE json_structure(props) IS NULL)
FROM events
""",
    tags=("quality",),
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite: null keys, value ranges, referential
    integrity (orphans via anti join), JSON validity. Returns one row
    per check with its violation count."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")

    def agg_check(df: DataFrame, name: str, cond) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count_if(cond).alias("n_violations"),
        )

    null_keys = agg_check(
        li,
        "lineitem_null_keys",
        F.col("l_orderkey").isNull() | F.col("l_partkey").isNull(),
    )
    nonpos = agg_check(
        li, "lineitem_nonpositive_price", F.col("l_extendedprice") <= 0
    )
    disc = agg_check(
        li,
        "lineitem_discount_range",
        (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5),
    )
    orphan_li = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orphan_lineitems").alias("check_name"), "n_violations")
    )
    orphan_o = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orphan_orders").alias("check_name"), "n_violations")
    )
    bad_json = agg_check(
        e, "events_bad_json", F.from_json("props", "map<string,int>").isNull()
    )
    return (
        null_keys.unionByName(nonpos)
        .unionByName(disc)
        .unionByName(orphan_li)
        .unionByName(orphan_o)
        .unionByName(bad_json)
    )
