"""SQL-surface parity: the same engine through ``spark.sql`` over the
registered temp views — a user of the reference's SQL serving path
(api/postgres/api.py:22-27 hands SQL text to Postgres) can hand the
identical text to this engine and Catalyst plans it the same way as
the DataFrame form (both compile to TakeOrderedAndProject etc.)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from master_airflow_spark.catalog import register_views
from master_airflow_spark.registry import register


@register(
    "sql_api_top1_alltime",
    oracle="""
(SELECT 'highest' AS which, l_extendedprice AS price, l_orderkey, l_linenumber
   FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 1)
UNION ALL
(SELECT 'lowest' AS which, l_extendedprice AS price, l_orderkey, l_linenumber
   FROM lineitem ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber LIMIT 1)
""",
    tags=("T3", "SQL"),
)
def sql_api_top1_alltime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Postgres serving query verbatim through
    spark.sql (modulo the deterministic tiebreakers every top-1 in
    this engine carries)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT 'highest' AS which, l_extendedprice AS price,
               l_orderkey, l_linenumber
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 1
        """
    ).unionByName(
        spark.sql(
            """
            SELECT 'lowest' AS which, l_extendedprice AS price,
                   l_orderkey, l_linenumber
            FROM lineitem
            ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber LIMIT 1
            """
        )
    )


@register(
    "sql_api_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    tags=("X7", "SQL"),
)
def sql_api_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the form rollup/cube can't express:
    per-flag and per-status marginals without the cross detail)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "zip_align_arrays",
    oracle="""
WITH t AS (
    SELECT p_partkey,
           string_split(p_name, ' ') AS ws,
           string_split(p_type, ' ') AS ts
    FROM part
)
SELECT p_partkey, ws[i] AS word, ts[i] AS typ, i AS pos
FROM t, LATERAL (SELECT unnest(range(1, least(len(ws), len(ts)) + 1)) AS i) u
""",
    tags=("P1", "X16"),
)
def zip_align_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 with an exact oracle: positional alignment of two parallel
    arrays (arrays_zip + posexplode), truncated to the shorter array —
    the scraper's ``zip`` semantics on relational data."""
    from pyspark.sql import functions as F

    from master_airflow_spark.catalog import load_table

    p = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    types = F.split("p_type", " ")
    z = p.select(
        "p_partkey",
        F.posexplode(F.arrays_zip(words.alias("w"), types.alias("t"))).alias(
            "pos0", "z"
        ),
    )
    return (
        z.where(F.col("z.w").isNotNull() & F.col("z.t").isNotNull())
        .select(
            "p_partkey",
            F.col("z.w").alias("word"),
            F.col("z.t").alias("typ"),
            (F.col("pos0") + 1).alias("pos"),
        )
    )
