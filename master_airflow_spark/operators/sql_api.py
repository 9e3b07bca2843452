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


@register(
    "correlated_scalar_select",
    oracle="""
SELECT n.n_name,
       (SELECT count(*) FROM customer c
        WHERE c.c_nationkey = n.n_nationkey) AS n_customers,
       (SELECT CAST(max(CAST(c2.c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
        FROM customer c2
        WHERE c2.c_nationkey = n.n_nationkey) AS max_balance
FROM nation n
""",
    tags=("X2", "SQL"),
)
def correlated_scalar_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT-position correlated scalar subqueries (two per row) —
    Catalyst decorrelates each into a grouped aggregate joined back on
    the correlation key, so the nation table is never probed row-at-a-
    time; nations with no customers surface NULL/0 via the preserved
    left join. Same decorrelation machinery as the WHERE-position form
    (scalar_subquery_above_avg), exercised where the reference's SQL
    serving path would hand the text straight to Postgres."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name,
               (SELECT count(*) FROM customer c
                WHERE c.c_nationkey = n.n_nationkey) AS n_customers,
               (SELECT CAST(max(CAST(c2.c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
                FROM customer c2
                WHERE c2.c_nationkey = n.n_nationkey) AS max_balance
        FROM nation n
        """
    )


@register(
    "lateral_join_agg",
    oracle="""
SELECT r.r_name, t.n_nations, t.total_customers
FROM region r,
     LATERAL (SELECT count(DISTINCT n.n_nationkey) AS n_nations,
                     count(c.c_custkey) AS total_customers
              FROM nation n
              LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
              WHERE n.n_regionkey = r.r_regionkey) t
""",
    tags=("X1", "X2", "SQL"),
)
def lateral_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table: per region, an aggregate
    computed by a subquery referencing the outer row. Catalyst
    rewrites the lateral into a decorrelated aggregate + join on
    r_regionkey (DecorrelateInnerQuery), so the plan is one grouped
    aggregate over nation⋈customer and a 5-row join — no per-region
    re-execution."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name, t.n_nations, t.total_customers
        FROM region r,
             LATERAL (SELECT count(DISTINCT n.n_nationkey) AS n_nations,
                             count(c.c_custkey) AS total_customers
                      FROM nation n
                      LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
                      WHERE n.n_regionkey = r.r_regionkey) t
        """
    )


@register(
    "recursive_cte_hierarchy",
    oracle="""
WITH RECURSIVE chain AS (
    SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
    FROM customer WHERE c_custkey <= 200
    UNION ALL
    SELECT start_key, cur // 2 AS cur, depth + 1
    FROM chain WHERE cur > 1
)
SELECT start_key,
       max(depth) AS depth_to_root,
       count(*) AS chain_len
FROM chain
GROUP BY start_key
""",
    tags=("X2", "SQL"),
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4): walk the implicit binary-heap
    hierarchy key → key/2 from each of the first 200 customers to the
    root, reporting chain depth — the transitive-closure/org-chart
    pattern that previously required the iterative-DataFrame loop
    (operators/clusters.py implements exactly that for connected
    components; this is the declarative form the SQL surface now
    plans natively as a repeated self-union until fixpoint)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
            SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
            FROM customer WHERE c_custkey <= 200
            UNION ALL
            SELECT start_key, CAST(cur / 2 AS BIGINT) AS cur, depth + 1
            FROM chain WHERE cur > 1
        )
        SELECT start_key,
               max(depth) AS depth_to_root,
               count(*) AS chain_len
        FROM chain
        GROUP BY start_key
        """
    )
