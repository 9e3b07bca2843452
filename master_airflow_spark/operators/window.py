"""Window operators — ranking, analytics, frames, top-k per group,
as-of join (SURVEY.md §2.7 X4, X8-X11).

Scale posture: every window here partitions by a real key (customer,
status, user) so state is distributed; there are no global
single-partition windows. The as-of join is the union-merge form — one
shuffle on the user key, no per-row range probe — which is the plan
that survives 100 TB (the naive range-join + filter explodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.functions.exact import cents, lsum_money
from master_airflow_spark.registry import register


@register(
    "rank_orders_window",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       row_number() OVER w AS rn,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
""",
    tags=("X8",),
)
def rank_orders_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over a keyed window, totally ordered by
    (price desc, orderkey) so ranks are deterministic."""
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "running_totals",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("X9",),
)
def running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / running sum per customer over order history. The
    running sum is decimal-accumulated: frame order is total, so both
    engines fold the identical sequence."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
        .over(wf)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "orders_in_trailing_30d",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate,
       count(*) OVER (PARTITION BY o_custkey
                      ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_last_30d
FROM orders
""",
    tags=("X9",),
)
def orders_in_trailing_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per order, how many orders the same
    customer placed in the trailing 30 days (inclusive). Ordered on
    epoch-day ints so the integer RANGE frame is engine-portable."""
    epoch_day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch_day)
        .rangeBetween(-30, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.count(F.lit(1)).over(w).alias("n_last_30d"),
    )


@register(
    "top_customers_per_segment",
    oracle="""
WITH spend AS (
    SELECT c.c_mktsegment, c.c_custkey, c.c_name,
           CAST(CAST(SUM(CAST(round((o.o_totalprice) * 100) AS BIGINT)) AS VARCHAR) AS DOUBLE) / 100.0 AS total_spend
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment, c.c_custkey, c.c_name
)
SELECT c_mktsegment, c_custkey, c_name, total_spend, rn
FROM (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                   ORDER BY total_spend DESC, c_custkey) AS rn
      FROM spend)
WHERE rn <= 5
""",
    tags=("X1", "X5", "X8", "X10"),
)
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: spend aggregate, then row_number ≤ 5 within
    each market segment. Agg shrinks the data *before* the window —
    the window input is one row per customer, not per order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(lsum_money(cents("o_totalprice"), 1, "total_spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey")
    )
    return (
        spend.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("c_mktsegment", "c_custkey", "c_name", "total_spend", "rn")
    )


@register(
    "multikey_sort_nulls",
    oracle="""
SELECT c_custkey, c_acctbal,
       CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END AS seg
FROM customer
ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey
LIMIT 100
""",
    tags=("X11",),
)
def multikey_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering, materialized through
    a LIMIT (TakeOrderedAndProject: per-partition top-k + k-row merge —
    no global sort at any scale). NULLS FIRST puts the nulled segment
    inside the observed window so the ordering semantics are judged."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.when(F.col("c_mktsegment") == "BUILDING", F.lit(None)).otherwise(
        F.col("c_mktsegment")
    )
    return (
        c.select("c_custkey", "c_acctbal", seg.alias("seg"))
        .orderBy(
            F.col("seg").asc_nulls_first(),
            F.col("c_acctbal").desc(),
            F.col("c_custkey"),
        )
        .limit(100)
    )


@register(
    "asof_join_events_orders",
    oracle="""
SELECT event_id, user_id, ts, o_orderkey AS last_orderkey,
       o_totalprice AS last_order_price
FROM (
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
           row_number() OVER (PARTITION BY e.event_id
                              ORDER BY o.o_orderdate DESC NULLS LAST,
                                       o.o_orderkey DESC NULLS LAST) AS rn
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
WHERE rn = 1
""",
    tags=("X4",),
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the user's most recent order at or
    before the event time (ties → highest orderkey); events with no
    prior order keep NULLs.

    Implemented as the union-merge plan, not a range join: tag orders
    and events, union, sort within each user by time, and carry the
    last-seen order forward with last(ignorenulls) over a running
    frame. One shuffle on user_id, O(n log n) — the naive
    range-join-then-rank plan (the oracle's formulation) multiplies
    every event by every prior order of that user and dies at scale."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    orders_side = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        F.struct("o_orderkey", "o_totalprice").alias("ord"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("o_orderkey").alias("tiebreak"),
    )
    events_side = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.lit(None)
        .cast("struct<o_orderkey:bigint,o_totalprice:double>")
        .alias("ord"),
        "event_id",
        "ts",
        F.col("event_id").alias("tiebreak"),
    )
    # order rows sort before events at the same t (is_order desc) so an
    # order dated exactly at ts is visible; among same-t orders the
    # highest orderkey sorts last and wins last().
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_order").desc(), F.col("tiebreak").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = orders_side.unionByName(events_side).withColumn(
        "last_ord", F.last("ord", ignorenulls=True).over(w)
    )
    return merged.where(F.col("is_order") == 0).select(
        "event_id",
        "user_id",
        "ts",
        F.col("last_ord.o_orderkey").alias("last_orderkey"),
        F.col("last_ord.o_totalprice").alias("last_order_price"),
    )


@register(
    "asof_join_tolerance",
    oracle="""
SELECT event_id, user_id, ts, o_orderkey AS last_orderkey,
       o_totalprice AS last_order_price
FROM (
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
           row_number() OVER (PARTITION BY e.event_id
                              ORDER BY o.o_orderdate DESC NULLS LAST,
                                       o.o_orderkey DESC NULLS LAST) AS rn
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id
     AND o.o_orderdate <= e.ts
     AND o.o_orderdate >= e.ts - INTERVAL 90 DAY
)
WHERE rn = 1
""",
    tags=("X4",),
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance horizon (pandas merge_asof's
    ``tolerance=``): the most recent order at or before each event,
    but only if it is within 90 days — older matches lapse to NULL.

    Same union-merge plan as asof_join_events_orders (one shuffle on
    user_id, no range-join blow-up); the tolerance is enforced AFTER
    the merge by also carrying the matched order's time forward and
    nulling the match when it is stale — O(1) extra state per row,
    while the oracle's range-join formulation multiplies every event
    by every in-horizon order."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    orders_side = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        F.struct("o_orderdate", "o_orderkey", "o_totalprice").alias("ord"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("o_orderkey").alias("tiebreak"),
    )
    events_side = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.lit(None)
        .cast("struct<o_orderdate:timestamp,o_orderkey:bigint,o_totalprice:double>")
        .alias("ord"),
        "event_id",
        "ts",
        F.col("event_id").alias("tiebreak"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_order").desc(), F.col("tiebreak").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = orders_side.unionByName(events_side).withColumn(
        "last_ord", F.last("ord", ignorenulls=True).over(w)
    )
    fresh = F.col("last_ord.o_orderdate") >= F.col("ts") - F.expr("INTERVAL 90 DAYS")
    return merged.where(F.col("is_order") == 0).select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("last_ord.o_orderkey")).alias("last_orderkey"),
        F.when(fresh, F.col("last_ord.o_totalprice")).alias("last_order_price"),
    )


@register(
    "scd2_purchase_history",
    oracle="""
SELECT user_id,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       value,
       CASE WHEN lead(ts) OVER w IS NULL THEN TRUE ELSE FALSE END AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("X33", "X9", "cdc"),
)
def scd2_purchase_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change stream
    (CDC apply): each purchase event sets the user's current value;
    lead() closes the previous validity interval half-open
    [valid_from, valid_to), the newest row stays open with
    is_current = true. One shuffle keyed on user_id — the standard
    SCD2 merge a warehouse pipeline runs per batch, and the interval
    table an as-of join then serves. Ties break on event_id, so the
    interval chain is total-ordered and deterministic."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        "value",
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "ratio_to_report",
    oracle="""
WITH agg AS (
    SELECT o_orderpriority, o_orderstatus,
           SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS grp_dec
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
)
SELECT o_orderpriority, o_orderstatus,
       CAST(grp_dec AS DOUBLE) AS grp_total,
       CAST(grp_dec AS DOUBLE)
         / CAST(SUM(grp_dec) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
         AS share_of_priority
FROM agg
""",
    tags=("X5", "X9"),
)
def ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each (priority, status) cell's share of its
    priority's total — the windowed-share idiom (share = value /
    SUM(value) OVER (PARTITION BY group)) that grouped ratios (q8)
    don't exercise. The window runs over the 15-row AGGREGATE, not the
    fact table, so the share step costs nothing at any scale; both
    numerator and denominator stay exact decimals until one final
    double division per row."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,4)")).alias("grp_dec")
    )
    w = Window.partitionBy("o_orderpriority")
    return agg.select(
        "o_orderpriority",
        "o_orderstatus",
        F.col("grp_dec").cast("double").alias("grp_total"),
        (
            F.col("grp_dec").cast("double")
            / F.sum("grp_dec").over(w).cast("double")
        ).alias("share_of_priority"),
    )


@register(
    "scd2_history_build",
    oracle="""
WITH changes AS (
    SELECT user_id, ts, event_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
),
kept AS (
    SELECT user_id, ts, event_id, event_type FROM changes
    WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id,
       row_number() OVER w AS version,
       event_type AS status,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM kept
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("X33", "X9", "X8"),
)
def scd2_history_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an ordered change
    log — the FULL SCD2 semantics on top of scd2_purchase_history's
    every-event intervals: collapse consecutive duplicate states per
    user first (lag compare — a repeated state must NOT open a new
    version), then turn each surviving change into a [valid_from,
    valid_to) interval with lead() plus a dense version number — the
    standard warehouse pattern for building
    effective-dated history out of CDC events, done as two window
    passes over ONE user-keyed shuffle (both windows share the
    (user_id, ts, event_id) sort, so Spark plans a single exchange +
    sort and no per-version self-join). (ts, event_id) is a total
    order, so version numbers and interval bounds are deterministic.
    At 100 TB: state per window partition is one user's events —
    distributed by user hash; no global sort anywhere."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    kept = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .drop("prev_type")
    )
    return kept.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
