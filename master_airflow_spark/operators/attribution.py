"""Attribution operators (SURVEY.md §2.7 X31): credit assignment from
conversion events back to touch events, in the as-of union-scan form
(a single ordered window pass per user — no per-conversion point
lookups, so the plan is one shuffle on user_id at any scale).

Split out of stats.py in round 5 (pure move; registrations, oracles,
and semantics unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.registry import register

@register(
    "last_touch_attribution",
    oracle="""
WITH ce AS (
    SELECT event_id, user_id, ts, event_type FROM events
    WHERE event_type IN ('click', 'purchase')
),
marked AS (
    SELECT event_id, user_id, ts, event_type,
           last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER w AS last_click_ts,
           last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
               OVER w AS last_click_id
    FROM ce
    WINDOW w AS (
        PARTITION BY user_id
        ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       CASE WHEN last_click_ts >= ts - INTERVAL 7 DAY
            THEN last_click_id END AS click_id,
       CASE WHEN last_click_ts >= ts - INTERVAL 7 DAY
            THEN epoch_us(ts) - epoch_us(last_click_ts) END AS gap_us
FROM marked
WHERE event_type = 'purchase'
""",
    tags=("X31", "X9"),
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent click within a 7-day lookback (clicks at
    the purchase's own timestamp count — they sort before the purchase
    in the window). Expressed as the UNION-scan as-of pattern, not a
    range self-join: one window over the interleaved click+purchase
    stream with last_value(... IGNORE NULLS) carries the latest click
    forward, so the whole operator is ONE shuffle keyed by user_id and
    never builds the clicks×purchases candidate space — at 100 TB the
    range join explodes quadratically per hot user while this stays
    linear in events per user. Unattributed purchases (no click in
    window) survive with NULL credit, preserving denominator
    semantics for conversion-rate math."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    is_click = F.col("event_type") == "click"
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.when(is_click, 0).otherwise(1), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(is_click, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("last_click_ts"),
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("last_click_id"),
    )
    in_window = F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY")
    return marked.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(in_window, F.col("last_click_id")).alias("click_id"),
        F.when(
            # ts loads as timestamp_ntz; UTC session tz makes the cast exact
            in_window,
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("last_click_ts").cast("timestamp")),
        ).alias("gap_us"),
    )


@register(
    "multi_touch_window_count",
    oracle="""
WITH ce AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us, ts
    FROM events WHERE event_type IN ('click', 'purchase')
),
counted AS (
    SELECT event_id, user_id, event_type, ts,
           count(*) FILTER (event_type = 'click') OVER (
               PARTITION BY user_id ORDER BY t_us
               RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
           ) AS n_touches_7d
    FROM ce
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       CAST(n_touches_7d AS BIGINT) AS n_touches_7d
FROM counted WHERE event_type = 'purchase'
""",
    tags=("X9", "X31"),
)
def multi_touch_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution denominator: for every purchase, how
    many clicks the user made in the trailing 7 days (the linear-
    credit model divides by exactly this). A RANGE frame over the
    microsecond event-time key — the physical-time sliding window X9
    calls for — so the whole operator is ONE user-keyed shuffle; no
    purchase×click join exists at any scale. Clicks at the purchase's
    own timestamp land inside the frame (RANGE is value-inclusive),
    matching last_touch_attribution's tie rule."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(t_us)
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, 0)
    )
    counted = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.count(F.when(F.col("event_type") == "click", 1)).over(w).alias(
            "n_touches_7d"
        ),
    )
    return counted.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "n_touches_7d",
    )
