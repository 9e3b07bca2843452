"""Top-k / argmax operators — the reference's entire analytics surface.

The reference serves exactly one analytical question two ways:
- today's highest & lowest price (Mongo API: ``find_one`` with a date
  filter + sort, reference ``api/mongo/main.py:68-77``) — T1/T2/T4+F1;
- all-time highest & lowest (Postgres API: ``SELECT * FROM gas_prices
  ORDER BY price DESC|ASC LIMIT 1``, ``api/postgres/api.py:22-27``) — T3.

Recast on the driver's star schema: ``l_extendedprice`` over
``lineitem`` plays the price column, ``CAST(l_shipdate AS DATE)`` the
date. The reference's ``find_one``/``LIMIT 1`` is tie-nondeterministic
(SURVEY.md §2.4); every query here adds a total-order tiebreaker.

Scale notes: ORDER BY + LIMIT k compiles to TakeOrderedAndProject — a
per-partition top-k then a k-row merge on the driver, no global sort —
and the "today" filter reaches the parquet scan as a pushed predicate
(partition pruning when the layout partitions by date). The scalar
"max date" is computed as a 1-row aggregate joined back via broadcast:
no driver-side collect, one extra lightweight job at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.registry import register

_PRICE_COLS = ["which", "price", "l_orderkey", "l_linenumber"]


def _labeled_extreme(df: DataFrame, label: str, ascending: bool) -> DataFrame:
    """One branch of the reference's two-query pattern: top-1 by price
    with a deterministic tiebreaker, labeled for the T4 union."""
    price = F.col("l_extendedprice")
    order = [
        price.asc() if ascending else price.desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    ]
    return (
        df.orderBy(*order)
        .limit(1)
        .select(
            F.lit(label).alias("which"),
            price.alias("price"),
            "l_orderkey",
            "l_linenumber",
        )
    )


def _with_today(df: DataFrame) -> DataFrame:
    """Filter to the latest ship date (the dataset's 'today'), half-open
    interval semantics per the Mongo API's ``[today, today+1d)`` filter."""
    today = df.agg(F.max(F.to_date("l_shipdate")).alias("d"))
    return (
        df.join(F.broadcast(today))
        .where(
            (F.col("l_shipdate") >= F.col("d").cast("timestamp"))
            & (F.col("l_shipdate") < F.date_add(F.col("d"), 1).cast("timestamp"))
        )
        .drop("d")
    )


@register(
    "top1_price_today",
    oracle="""
WITH today AS (SELECT max(CAST(l_shipdate AS DATE)) AS d FROM lineitem),
scoped AS (
  SELECT l.* FROM lineitem l, today
  WHERE l.l_shipdate >= CAST(today.d AS TIMESTAMP)
    AND l.l_shipdate <  CAST(today.d AS TIMESTAMP) + INTERVAL 1 DAY
)
(SELECT 'highest' AS which, l_extendedprice AS price, l_orderkey, l_linenumber
   FROM scoped ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 1)
UNION ALL
(SELECT 'lowest' AS which, l_extendedprice AS price, l_orderkey, l_linenumber
   FROM scoped ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber LIMIT 1)
""",
    tags=("T1", "T2", "T4", "F1"),
)
def top1_price_today(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Today's highest & lowest price row (reference api/mongo/main.py:63-77)."""
    scoped = _with_today(load_table(spark, sf_dir, "lineitem"))
    high = _labeled_extreme(scoped, "highest", ascending=False)
    low = _labeled_extreme(scoped, "lowest", ascending=True)
    return high.unionByName(low)


@register(
    "top1_price_alltime",
    oracle="""
(SELECT 'highest' AS which, l_extendedprice AS price, l_orderkey, l_linenumber
   FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 1)
UNION ALL
(SELECT 'lowest' AS which, l_extendedprice AS price, l_orderkey, l_linenumber
   FROM lineitem ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber LIMIT 1)
""",
    tags=("T3", "T4"),
)
def top1_price_alltime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-time highest & lowest (reference api/postgres/api.py:16-33)."""
    li = load_table(spark, sf_dir, "lineitem")
    high = _labeled_extreme(li, "highest", ascending=False)
    low = _labeled_extreme(li, "lowest", ascending=True)
    return high.unionByName(low)


@register(
    "daily_high_low",
    oracle="""
SELECT CAST(l_shipdate AS DATE) AS ship_date,
       max(l_extendedprice) AS high_price,
       min(l_extendedprice) AS low_price,
       count(*) AS n_rows
FROM lineitem
GROUP BY 1
""",
    tags=("T1", "T2", "X5"),
)
def daily_high_low(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day high/low — the serving query generalized to every day in
    one single-pass hash aggregate (vs the reference's two sorted scans
    per request). min/max are order-independent, so no decimal cast is
    needed for hash-stability."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.to_date("l_shipdate").alias("ship_date"))
        .agg(
            F.max("l_extendedprice").alias("high_price"),
            F.min("l_extendedprice").alias("low_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entry() query: today's high/low over sf0.001 (driver smoke check)."""
    return top1_price_today(spark, sf_dir)
