"""Statistical & reshaping operators — exact moments, grouped
correlation, conditional aggregates, ordered string aggregation,
gaps-and-islands sessionization, distribution windows, unpivot/melt;
plus the round-4 analytics layer: last-touch / multi-touch
attribution (union-scan + RANGE frames, never a range join),
time-weighted averages, robust statistics (exact MAD / winsorized
mean over integer cents), equi-depth NTILE via distributed two-phase
ranking, association rules, OLS trend, week-over-week reporting.

Extends the reference's aggregate surface (SURVEY.md §2 X5/X8/X9/X18)
with the descriptive-statistics layer a pretraining-data pipeline logs
per batch. Scale posture: every aggregate here is a map-side-combinable
hash aggregate on decimal sufficient statistics (sum, sum-of-squares,
cross-products) — order-independent and exact, so the same query
hash-matches a single-threaded oracle today and a 1000-executor
partial-agg tree at 100 TB. Variance/correlation are derived from those
sums in one deterministic double expression, never via engine-native
``stddev``/``corr`` whose fold order is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.functions.exact import dmul, dsum, sql_dsum, sql_dsum_prod
from master_airflow_spark.registry import register, track_cache


@register(
    "stats_moments",
    oracle=f"""
SELECT o_orderpriority,
       count(*) AS n,
       {sql_dsum("o_totalprice")} / count(*) AS mean_price,
       ({sql_dsum_prod("o_totalprice", "o_totalprice")}
        - {sql_dsum("o_totalprice")} * {sql_dsum("o_totalprice")} / count(*))
       / (count(*) - 1) AS var_price,
       sqrt(({sql_dsum_prod("o_totalprice", "o_totalprice")}
             - {sql_dsum("o_totalprice")} * {sql_dsum("o_totalprice")} / count(*))
            / (count(*) - 1)) AS std_price
FROM orders
GROUP BY o_orderpriority
""",
    tags=("X5",),
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority mean / sample variance / stddev of order totals,
    computed from exact decimal sufficient statistics (Σx, Σx², n) and
    one deterministic double expression — the drift metrics a pipeline
    snapshots per batch. One hash aggregate, fully map-side combinable."""
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x, "sx"),
        F.sum(dmul(x, x)).cast("double").alias("sx2"),
    )
    mean = F.col("sx") / F.col("n")
    var = (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    return agg.select(
        "o_orderpriority",
        "n",
        mean.alias("mean_price"),
        var.alias("var_price"),
        F.sqrt(var).alias("std_price"),
    )


@register(
    "corr_qty_price",
    oracle=f"""
SELECT l_returnflag,
       count(*) AS n,
       (count(*) * {sql_dsum_prod("l_quantity", "l_extendedprice")}
        - {sql_dsum("l_quantity")} * {sql_dsum("l_extendedprice")})
       / (sqrt(count(*) * {sql_dsum_prod("l_quantity", "l_quantity")}
               - {sql_dsum("l_quantity")} * {sql_dsum("l_quantity")})
          * sqrt(count(*) * {sql_dsum_prod("l_extendedprice", "l_extendedprice")}
                 - {sql_dsum("l_extendedprice")} * {sql_dsum("l_extendedprice")}))
           AS corr_qp
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("X5",),
)
def corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return
    flag, from exact decimal cross-product sums (Σx, Σy, Σxy, Σx², Σy²)
    — order-independent where engine-native ``corr`` is not. Single
    shuffle on the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x, "sx"),
        dsum(y, "sy"),
        F.sum(dmul(x, y)).cast("double").alias("sxy"),
        F.sum(dmul(x, x)).cast("double").alias("sx2"),
        F.sum(dmul(y, y)).cast("double").alias("sy2"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(n * F.col("sx2") - F.col("sx") * F.col("sx")) * F.sqrt(
        n * F.col("sy2") - F.col("sy") * F.col("sy")
    )
    return agg.select("l_returnflag", "n", (num / den).alias("corr_qp"))


@register(
    "conditional_aggregates",
    oracle="""
SELECT o_orderstatus,
       CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_large,
       CAST(count_if(o_totalprice > 150000) AS DOUBLE) / count(*) AS frac_large,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       arg_max(o_orderdate, o_orderkey) AS latest_key_date,
       arg_min(o_orderdate, o_orderkey) AS earliest_key_date
FROM orders
GROUP BY o_orderstatus
""",
    tags=("X5", "X15"),
)
def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-conditioned aggregates per status: count_if /
    bool_and / bool_or plus arg-max/arg-min rows (max_by keyed on the
    unique o_orderkey so the winner is total-ordered, not
    tie-nondeterministic). All map-side combinable."""
    o = load_table(spark, sf_dir, "orders")
    large = F.col("o_totalprice") > 150000
    return o.groupBy("o_orderstatus").agg(
        F.count_if(large).alias("n_large"),
        (F.count_if(large).cast("double") / F.count(F.lit(1))).alias("frac_large"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.max_by("o_orderdate", "o_orderkey").alias("latest_key_date"),
        F.min_by("o_orderdate", "o_orderkey").alias("earliest_key_date"),
    )


@register(
    "listagg_nation_customers",
    oracle="""
SELECT n.n_name,
       count(*) AS n_customers,
       string_agg(c.c_name, ',' ORDER BY c.c_name) AS customer_csv
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > 9000
GROUP BY n.n_name
""",
    tags=("X5", "X13"),
)
def listagg_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG) of high-balance
    customer names per nation. collect_list is partition-order-dependent
    → array_sort before joining makes it deterministic. Nation side is
    broadcast; one shuffle on the group key."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.concat_ws(",", F.array_sort(F.collect_list("c_name"))).alias(
                "customer_csv"
            ),
        )
    )


@register(
    "sessionize_events",
    oracle="""
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > 1800000000
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
), numbered AS (
    SELECT *, CAST(sum(new_session)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS BIGINT) AS session_no
    FROM flagged
)
SELECT user_id, session_no,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS session_value
FROM numbered
GROUP BY user_id, session_no
""",
    tags=("X9", "X20"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a session breaks after
    a 30-minute silence per user. lag + running sum over a user-keyed
    window — state is distributed by user_id, one shuffle, then the
    per-session rollup reuses the same partitioning (no second
    exchange). The batch twin of the streaming session window (X20);
    gap math on unix microseconds so both engines compare integers."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast: events.ts reads as timestamp_ntz on Spark 4.1+, which
    # unix_micros rejects; UTC session tz makes the cast exact
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    new_sess = (
        F.when(
            (us - F.lag(us).over(w) > 1_800_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session")
    )
    numbered = e.select(
        "user_id", "event_id", "ts", "value", new_sess
    ).withColumn("session_no", F.sum("new_session").over(w))
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "session_value"),
    )


@register(
    "window_distribution",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       first_value(o_orderkey) OVER w AS cheapest_key,
       last_value(o_orderkey)
           OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS priciest_key,
       nth_value(o_orderkey, 2)
           OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS runner_up_key
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
    tags=("X8", "X9"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank / cume_dist /
    first, last, nth value — over a status-keyed, totally-ordered
    window (price then unique key, so every rank is deterministic).
    Partitioned by a real key: no global single-partition window."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(wfull).alias("priciest_key"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("runner_up_key"),
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
FROM lineitem WHERE l_shipdate BETWEEN DATE '1995-06-01' AND DATE '1995-06-30'
UNION ALL
SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
FROM lineitem WHERE l_shipdate BETWEEN DATE '1995-06-01' AND DATE '1995-06-30'
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount
FROM lineitem WHERE l_shipdate BETWEEN DATE '1995-06-01' AND DATE '1995-06-30'
""",
    tags=("X18",),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — wide measures to long (row, measure, value) form,
    the inverse of pivot (X18). Narrow-time slice first so the date
    filter is pushed to the parquet scan; unpivot itself is a
    zero-shuffle projection."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1995-06-01", "1995-06-30")
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    ).withColumn("measure", F.regexp_replace("measure", "^l_", ""))


@register(
    "events_rollup_grids",
    oracle=f"""
SELECT 'hour' AS grain,
       time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
       event_type, count(*) AS n_events, {sql_dsum('value')} AS sum_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day' AS grain,
       time_bucket(INTERVAL '1 day', ts) AS bucket_start,
       event_type, count(*) AS n_events, {sql_dsum('value')} AS sum_value
FROM events GROUP BY 2, 3
""",
    tags=("X5", "X14", "X19"),
)
def events_rollup_grids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (the hypertable continuous-
    aggregate shape): hourly AND daily grids per event type from ONE
    scan and ONE shuffle — each event explodes into its (grain,
    bucket) memberships before the aggregate, so adding a grain costs
    fan-out, not another pass. The oracle states the same result as
    two UNION ALL'd time_bucket aggregates."""
    e = load_table(spark, sf_dir, "events")
    grains = F.array(
        F.struct(
            F.lit("hour").alias("grain"),
            F.date_trunc("hour", F.col("ts")).alias("bucket_start"),
        ),
        F.struct(
            F.lit("day").alias("grain"),
            F.date_trunc("day", F.col("ts")).alias("bucket_start"),
        ),
    )
    return (
        e.select(F.explode(grains).alias("g"), "event_type", "value")
        .groupBy(
            F.col("g.grain").alias("grain"),
            F.col("g.bucket_start").alias("bucket_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
    )


@register(
    "funnel_conversion",
    oracle="""
WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked_after_view,
       (SELECT count(*) FROM p) AS n_purchased_after_click,
       CAST((SELECT count(*) FROM c) AS DOUBLE)
           / (SELECT count(*) FROM v) AS view_to_click_rate,
       CAST((SELECT count(*) FROM p) AS DOUBLE)
           / (SELECT count(*) FROM c) AS click_to_purchase_rate
""",
    tags=("X1", "X5", "X9"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click after view → purchase
    after click), the product-analytics staple: each stage is the
    MIN event time per user constrained to follow the previous
    stage's time. Output is one row of stage counts + conversion
    rates (single IEEE divisions — deterministic).

    Round-15 single-pass rewrite (guide §1.2 "remove unnecessary
    passes", §2.4 shared exchange): the original chained three
    per-user aggregates with equi-joins on user_id — correct, but the
    stage frames feed both the next join AND their own count branch,
    and Spark re-executes shared subtrees across branches: the plan
    scanned events six times over eight exchanges. Now ONE scan of
    the three event types, one user_id exchange, and three sort-free
    MIN windows over the same partitioning (t_click's predicate reads
    the t_view column the previous window produced — min over an
    empty/false set is NULL, which reproduces the join semantics:
    ts > NULL is never true, so users missing a stage stay NULL
    through every later stage). The per-user rollup and the final
    1-row count reuse the same exchange. Outputs verified equal and
    re-certified vs the oracle at sf0.01/sf0.1. Interleaved
    prepared-plan A/B: sf0.1 0.445→0.308 s min-of-6 (−31%); x50
    events 1.08→0.73 s min-of-5 (−33%), all pairs. Scale note: the
    window shape collates each user's events into one partition with
    no map-side partial agg — per-user event counts are bounded by
    human activity, the same collation every funnel/sessionization
    operator needs.

    Data contract (round-16, r15 ADVICE): stage counts are
    count(t_<stage>) — non-NULL minimum event TIME per user — while
    the chained-join form (and the oracle) counts a user with ≥1
    qualifying event ROW even if its ts were NULL. The two agree
    because events.ts is NOT NULL in this schema (generated data has
    no NULL timestamps; a NULL ts row would be semantically broken —
    ordering events is the table's purpose). If a nullable-ts source
    is ever wired in, count an event-presence flag (e.g.
    max(event_type = 'view')) instead of the min timestamp."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts")
    )
    wu = Window.partitionBy("user_id")
    x = e.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
    )
    x = x.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(wu),
    )
    x = x.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(wu),
    )
    per_user = x.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    counts = per_user.agg(
        F.count("t_view").alias("n_viewed"),
        F.count("t_click").alias("n_clicked_after_view"),
        F.count("t_purchase").alias("n_purchased_after_click"),
    )
    return counts.select(
        "n_viewed",
        "n_clicked_after_view",
        "n_purchased_after_click",
        (
            F.col("n_clicked_after_view").cast("double") / F.col("n_viewed")
        ).alias("view_to_click_rate"),
        (
            F.col("n_purchased_after_click").cast("double")
            / F.col("n_clicked_after_view")
        ).alias("click_to_purchase_rate"),
    )


@register(
    "incremental_rollup_merge",
    oracle=f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start, event_type,
       count(*) AS n_events, {sql_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("X5", "X14", "X19"),
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance: the hourly rollup
    is computed as two INDEPENDENT partial rollups — the 'stored' base
    (events before 1999) and the 'newly arrived' delta (1999 onward) —
    merged by re-aggregating the partials. COUNT merges by addition
    and the decimal SUM is associative, so the merged rollup is
    bit-identical to the full recompute the oracle states: that
    equality IS the incremental-view-maintenance contract. At 100 TB
    the base never rescans — only delta partitions aggregate, and the
    merge touches just the (bucket, type) rows the delta produced."""
    e = load_table(spark, sf_dir, "events")
    split = F.lit("1999-01-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket_start"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_part"),
            F.sum(F.col("value").cast("decimal(28,4)")).alias("sum_part"),
        )

    base = partial(e.where(F.col("ts") < split))
    delta = partial(e.where(F.col("ts") >= split))
    return (
        base.unionByName(delta)
        .groupBy("bucket_start", "event_type")
        .agg(
            F.sum("n_part").alias("n_events"),
            F.sum("sum_part").cast("double").alias("sum_value"),
        )
    )


@register(
    "daily_revenue_gap_filled",
    oracle=f"""
WITH bounds AS (
    SELECT CAST(min(o_orderdate) AS DATE) AS d0,
           CAST(max(o_orderdate) AS DATE) AS d1
    FROM orders
),
spine AS (
    SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                       CAST(d1 AS TIMESTAMP),
                                       INTERVAL 1 DAY)) AS DATE) AS day
    FROM bounds
),
daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           count(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders GROUP BY 1
)
SELECT s.day,
       COALESCE(d.n_orders, 0) AS n_orders,
       COALESCE(d.revenue, 0.0) AS revenue
FROM spine s LEFT JOIN daily d ON d.day = s.day
""",
    tags=("X1", "X14"),
)
def daily_revenue_gap_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill: daily order revenue with EVERY day
    between the first and last order present — missing days surface as
    explicit zero rows (the shape reporting and forecasting inputs
    need). The spine generates from the min/max bounds (a 1-row
    aggregate broadcast into a sequence explode — no driver collect),
    and the left join's spine side is date-cardinality-bounded, so at
    100 TB it broadcasts against the aggregated daily table."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "revenue"),
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )


@register(
    "event_rate_anomalies",
    oracle="""
WITH hourly AS (
    SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
scored AS (
    SELECT hour, event_type, n,
           CAST(sum(n) OVER w AS BIGINT) AS s1,
           CAST(sum(n * n) OVER w AS BIGINT) AS s2,
           CAST(count(n) OVER w AS BIGINT) AS k
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
),
hist AS (
    SELECT hour, event_type, n, k,
           (s2 - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1) AS var,
           CAST(s1 AS DOUBLE) / k AS mean
    FROM scored WHERE k >= 12
)
SELECT hour, event_type, n, k, (n - mean) / sqrt(var) AS z
FROM hist
WHERE var > 0 AND abs((n - mean) / sqrt(var)) > 2
""",
    tags=("X5", "X9", "X19"),
)
def event_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed rate-anomaly detection: hourly event counts per type,
    z-scored against the trailing 24 observed hours (rows frame —
    sufficient statistics Σn, Σn² are INTEGER sums over counts, so the
    window math is exact on both engines and the z expression is one
    fixed-order double computation). Flags |z| > 2 once 12 hours of
    history exist. One shuffle for the hourly aggregate; the window
    re-uses its (event_type) partitioning."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    scored = hourly.select(
        "hour",
        "event_type",
        "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count("n").over(w).alias("k"),
    )
    # filter BEFORE the divisions: under ANSI mode the short-history
    # rows (k = 0) would raise DIVIDE_BY_ZERO inside the projection;
    # var > 0 likewise guards a constant-rate window (sqrt(0) divisor)
    hist = scored.where(F.col("k") >= 12).select(
        "hour",
        "event_type",
        "n",
        "k",
        (
            (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("k"))
            / (F.col("k") - 1)
        ).alias("var"),
        (F.col("s1").cast("double") / F.col("k")).alias("mean"),
    )
    z = (F.col("n") - F.col("mean")) / F.sqrt(F.col("var"))
    return (
        hist.where(F.col("var") > 0)
        .select("hour", "event_type", "n", "k", z.alias("z"))
        .where(F.abs(F.col("z")) > 2)
    )


@register(
    "cohort_retention",
    oracle="""
WITH firsts AS (
    SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT e.user_id, f.cohort_week,
           CAST(floor(date_diff('day', f.cohort_week,
                                CAST(date_trunc('week', e.ts) AS DATE)) / 7.0)
                AS INT) AS week_offset
    FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT cohort_week, week_offset,
       CAST(count(*) AS BIGINT) AS n_active_users
FROM activity
GROUP BY cohort_week, week_offset
""",
    tags=("X5", "X14", "X8"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, one
    row per (cohort, week offset) with the count of users active that
    week — the classic product-analytics triangle. The first-seen
    aggregate, the enrich join, and the per-user dedup all key on
    user_id, so they share one shuffle; week offsets are integer day
    arithmetic (exact on both engines)."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"),
                           F.col("cohort_week")) / 7.0
            ).cast("int").alias("week_offset"),
        )
        .dropDuplicates(["user_id", "cohort_week", "week_offset"])
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@register(
    "event_transition_matrix",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM ordered
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
    tags=("X5", "X9"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts between consecutive events per user
    (path/funnel exploration): lead() over the per-user timeline with
    a deterministic (ts, event_id) order, then count per (from, to)
    pair. One shuffle for the window; the 5×5 output aggregate is
    map-side combinable."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        ordered.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "price_histogram",
    oracle="""
WITH mm AS (
    SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
    FROM lineitem
)
SELECT CASE WHEN mx = mn THEN 0
            ELSE LEAST(CAST(floor((l_extendedprice - mn)
                                  / ((mx - mn) / 10.0)) AS INT), 9) END AS bin,
       mn + (CASE WHEN mx = mn THEN 0
                  ELSE LEAST(CAST(floor((l_extendedprice - mn)
                                        / ((mx - mn) / 10.0)) AS INT), 9) END)
            * ((mx - mn) / 10.0) AS bin_lo,
       count(*) AS n_items
FROM lineitem, mm
GROUP BY 1, 2
""",
    tags=("X5", "X15"),
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 10-bin histogram of l_extendedprice. The min/max
    scalar pair is a 1-row broadcast joined onto the fact scan — two
    passes total, both full-scan-parallel, the shape a profiler uses
    at any scale. Bin assignment is (x−mn)/width floored, max value
    clamped into the top bin; every arithmetic step is the same IEEE
    double op sequence on both engines, so bin membership cannot
    drift. Degenerate input (min == max → width 0) puts every row in
    bin 0 on both engines — guarded explicitly because zero-width
    division is NULL under Spark's non-ANSI mode but ±inf/nan in
    DuckDB."""
    li = load_table(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / 10.0
    bin_ = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("l_extendedprice") - F.col("mn")) / width).cast("int"),
            F.lit(9),
        )
    )
    return (
        li.join(F.broadcast(mm))
        .groupBy(
            bin_.alias("bin"),
            (F.col("mn") + bin_ * width).alias("bin_lo"),
        )
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "interpolate_sparse_series",
    oracle=f"""
WITH big AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders WHERE o_totalprice > 450000 GROUP BY 1
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM big),
spine AS (
    SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                       CAST(d1 AS TIMESTAMP),
                                       INTERVAL 1 DAY)) AS DATE) AS day
    FROM bounds
),
j AS (
    SELECT s.day, b.revenue FROM spine s LEFT JOIN big b ON b.day = s.day
),
ctx AS (
    SELECT day, revenue,
           last_value(revenue IGNORE NULLS)
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS prev_v,
           last_value(CASE WHEN revenue IS NOT NULL THEN day END IGNORE NULLS)
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS prev_d,
           first_value(revenue IGNORE NULLS)
               OVER (ORDER BY day ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS next_v,
           first_value(CASE WHEN revenue IS NOT NULL THEN day END IGNORE NULLS)
               OVER (ORDER BY day ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS next_d
    FROM j
)
SELECT day, revenue,
       CASE WHEN revenue IS NOT NULL THEN revenue
            WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
            ELSE prev_v + (next_v - prev_v)
                 * (CAST(datediff('day', prev_d, day) AS DOUBLE)
                    / CAST(datediff('day', prev_d, next_d) AS DOUBLE))
       END AS revenue_interp
FROM ctx
""",
    tags=("X9", "X14"),
)
def interpolate_sparse_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a sparse daily series (high-value
    order revenue, observed on ~6% of days) — the imputation sibling
    of daily_revenue_gap_filled's zero-fill: gap days get
    prev + (next−prev)·(Δdays/gap) from the bracketing observations,
    edge days before the first / after the last observation stay NULL.
    prev/next come from IGNORE NULLS running last/first over the
    calendar spine. The window is global but runs over the AGGREGATED
    date-cardinality-bounded series (≤ a few thousand rows whatever
    the fact-table size), so the single-partition sort is as cheap at
    100 TB as here; observations themselves pass through exactly (the
    interp expression short-circuits to the observed value)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        dsum("o_totalprice", "revenue")
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    j = spine.join(daily, "day", "left")
    wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = Window.orderBy("day").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_day = F.when(F.col("revenue").isNotNull(), F.col("day"))
    ctx = j.select(
        "day",
        "revenue",
        F.last("revenue", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("prev_d"),
        F.first("revenue", ignorenulls=True).over(wn).alias("next_v"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("next_d"),
    )
    frac = F.datediff("day", "prev_d").cast("double") / F.datediff(
        "next_d", "prev_d"
    ).cast("double")
    interp = (
        F.when(F.col("revenue").isNotNull(), F.col("revenue"))
        .when(F.col("prev_v").isNull() | F.col("next_v").isNull(), F.lit(None))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    return ctx.select("day", "revenue", interp.alias("revenue_interp"))


@register(
    "equi_depth_price_buckets",
    oracle=f"""
WITH tiled AS (
    SELECT o_totalprice,
           ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
    FROM orders
)
SELECT bucket,
       count(*) AS n_orders,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price,
       {sql_dsum('o_totalprice')} AS sum_price
FROM tiled
GROUP BY bucket
""",
    tags=("X32", "X8", "X5"),
)
def equi_depth_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (NTILE) histogram of order prices — the
    boundary-discovery primitive behind range-partitioner planning and
    quantile-bucketed length normalization. Semantically ntile(10)
    over a global total order, but NOT executed as a global window
    (which funnels every row through one partition): rows are bucketed
    by a deterministic value-range expression (price div 10000 — data
    values, not sampled exchange boundaries), row-numbered within each
    value bucket, and offset by the broadcast prefix-sum of bucket
    sizes — the same two-phase distributed ranking as surrogate_keys.
    The exact NTILE fill rule (first total%10 tiles get one extra row)
    is then pure arithmetic on the global row number. The final
    aggregate is 10 groups; everything before it is fully parallel."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bucketed = o.withColumn("vbkt", F.expr("CAST(o_totalprice AS BIGINT) div 10000"))
    local_w = Window.partitionBy("vbkt").orderBy("o_totalprice", "o_orderkey")
    offsets_w = Window.orderBy("vbkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    sizes = bucketed.groupBy("vbkt").agg(F.count(F.lit(1)).alias("n"))
    offsets = sizes.withColumn(
        "offset", F.coalesce(F.sum("n").over(offsets_w), F.lit(0))
    ).select("vbkt", "offset")
    total_df = sizes.agg(F.sum("n").alias("total"))
    rn = (
        bucketed.withColumn("prn", F.row_number().over(local_w))
        .join(F.broadcast(offsets), "vbkt")
        .crossJoin(F.broadcast(total_df))
        .withColumn("rownum", F.col("offset") + F.col("prn"))
    )
    # ntile(10) fill rule: q = total div 10, r = total % 10; the first
    # r tiles have q+1 rows.
    tiled = rn.withColumn(
        "bucket",
        F.expr(
            """
            CASE WHEN rownum <= (total % 10) * (total div 10 + 1)
                 THEN (rownum - 1) div (total div 10 + 1) + 1
                 ELSE (total % 10)
                      + (rownum - (total % 10) * (total div 10 + 1) - 1)
                        div (total div 10) + 1
            END
            """
        ).cast("int"),
    )
    return tiled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "nation_revenue_trend",
    oracle=f"""
WITH daily AS (
    SELECT n.n_name,
           date_diff('day', DATE '1992-01-01', CAST(o.o_orderdate AS DATE))
               AS day_x,
           {sql_dsum('o.o_totalprice')} AS rev
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name, day_x
)
SELECT n_name,
       count(*) AS n_days,
       (count(*) * {sql_dsum_prod('day_x', 'rev')}
        - {sql_dsum('day_x')} * {sql_dsum('rev')})
       / (count(*) * {sql_dsum_prod('day_x', 'day_x')}
          - {sql_dsum('day_x')} * {sql_dsum('day_x')}) AS slope_per_day
FROM daily
GROUP BY n_name
""",
    tags=("X5", "X1"),
)
def nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue trend: OLS slope of daily order revenue vs
    day number (days since 1992-01-01) — the drift/trend monitor shape
    (is this source growing or decaying?) as a pure two-level
    aggregate. Level 1 groups to (nation, day) with exact decimal
    revenue sums; level 2 folds the OLS sufficient statistics (n, Σx,
    Σy, Σxy, Σx²) through the same decimal-exact path as
    stats_moments/corr_qty_price, then ONE shared double expression
    computes the slope — identical operand order in both engines, so
    the result is bit-identical despite double rounding. Customer and
    nation dims broadcast; the two groupBys shuffle once each and the
    second input (nations × days) is tiny."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")).alias(
                "day_x"
            ),
        )
        .agg(dsum("o_totalprice", "rev"))
    )
    x, y = F.col("day_x"), F.col("rev")
    agg = daily.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_days"),
        dsum(x, "sx"),
        dsum(y, "sy"),
        F.sum(dmul(x, y)).cast("double").alias("sxy"),
        F.sum(dmul(x, x)).cast("double").alias("sx2"),
    )
    nn = F.col("n_days")
    slope = (nn * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nn * F.col("sx2") - F.col("sx") * F.col("sx")
    )
    return agg.select("n_name", "n_days", slope.alias("slope_per_day"))


@register(
    "event_type_association",
    oracle="""
WITH ut AS (
    SELECT DISTINCT user_id, event_type FROM events
),
n_users AS (
    SELECT count(DISTINCT user_id) AS n FROM events
),
singles AS (
    SELECT event_type, count(*) AS n_et FROM ut GROUP BY event_type
),
pairs AS (
    SELECT a.event_type AS antecedent, b.event_type AS consequent,
           count(*) AS n_both
    FROM ut a JOIN ut b
      ON b.user_id = a.user_id AND a.event_type <> b.event_type
    GROUP BY antecedent, consequent
)
SELECT p.antecedent, p.consequent, p.n_both,
       CAST(p.n_both AS DOUBLE) / sa.n_et AS confidence,
       CAST(p.n_both AS DOUBLE) * n.n / (sa.n_et * sb.n_et) AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.antecedent
JOIN singles sb ON sb.event_type = p.consequent
CROSS JOIN n_users n
""",
    tags=("X5", "X1"),
)
def event_type_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over per-user event-type baskets (the
    market-basket shape: antecedent→consequent support, confidence,
    lift). The itemset universe is the event-type vocabulary — tiny —
    so the pair space is bounded (|types|²) even at 100 TB: one
    distinct on (user, type) keyed by user, a user-keyed self-join
    whose per-user row count is ≤|types|, and broadcast joins of the
    two vocabulary-sized frequency tables. The only corpus-scale
    shuffle is the initial distinct. Confidence/lift are single
    double divisions of exact integer counts — bit-identical across
    engines."""
    e = load_table(spark, sf_dir, "events")
    ut = track_cache(e.select("user_id", "event_type").distinct())
    n_users = ut.select(F.countDistinct("user_id").alias("n"))
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_et"))
    a = ut.select(F.col("user_id"), F.col("event_type").alias("antecedent"))
    b = ut.select(F.col("user_id"), F.col("event_type").alias("consequent"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(
        F.col("event_type").alias("antecedent"), F.col("n_et").alias("na")
    )
    sb = singles.select(
        F.col("event_type").alias("consequent"), F.col("n_et").alias("nb")
    )
    return (
        pairs.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sb), "consequent")
        .crossJoin(F.broadcast(n_users))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            (F.col("n_both").cast("double") / F.col("na")).alias("confidence"),
            (
                F.col("n_both").cast("double") * F.col("n")
                / (F.col("na") * F.col("nb"))
            ).alias("lift"),
        )
    )


@register(
    "twap_user_value",
    oracle="""
WITH seq AS (
    SELECT user_id,
           CAST(round(value * 100) AS BIGINT) AS v_c,
           epoch_us(ts) AS t_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_us
    FROM events
),
weighted AS (
    SELECT user_id,
           v_c * (next_us - t_us) AS vw_c,
           next_us - t_us AS w
    FROM seq WHERE next_us IS NOT NULL
)
SELECT user_id,
       count(*) AS n_intervals,
       CAST(SUM(w) AS BIGINT) AS total_us,
       CAST(CAST(SUM(vw_c) AS BIGINT) AS DOUBLE)
           / (100.0 * CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE)) AS twap
FROM weighted
GROUP BY user_id
""",
    tags=("X9", "X5"),
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (the TWAP/financial form
    of mean: each observation weighted by how long it was the current
    value, i.e. until the user's next event). lead() over a user-keyed
    window supplies interval ends — one shuffle on user_id; the last
    (open-ended) observation drops, standard TWAP-to-last-tick.
    Exactness: values become integer CENTS and weights are integer
    microseconds, so value·weight and both sums stay in exact BIGINT
    space; the final division is one double op on identical exact
    operands — engine-order independent (the decimal-cast variant
    tripped on Spark-vs-DuckDB double→DECIMAL rounding-mode
    differences)."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
        us.alias("t_us"),
        F.lead(us).over(w).alias("next_us"),
    ).where(F.col("next_us").isNotNull())
    weighted = seq.select(
        "user_id",
        (F.col("v_c") * (F.col("next_us") - F.col("t_us"))).alias("vw_c"),
        (F.col("next_us") - F.col("t_us")).alias("w"),
    )
    return weighted.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("w").alias("total_us"),
        (
            F.sum("vw_c").cast("double")
            / (F.lit(100.0) * F.sum("w").cast("double"))
        ).alias("twap"),
    )


@register(
    "weekly_revenue_wow",
    oracle=f"""
WITH weekly AS (
    SELECT date_trunc('week', CAST(o_orderdate AS DATE)) AS week_start,
           {sql_dsum('o_totalprice')} AS revenue,
           count(*) AS n_orders
    FROM orders
    GROUP BY week_start
)
SELECT CAST(week_start AS DATE) AS week_start, n_orders, revenue,
       lag(revenue) OVER (ORDER BY week_start) AS prev_revenue,
       (revenue - lag(revenue) OVER (ORDER BY week_start))
           / lag(revenue) OVER (ORDER BY week_start) AS wow_change
FROM weekly
""",
    tags=("X9", "X14", "X5"),
)
def weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue change — the reporting-layer lag()
    pattern over an already-aggregated series. The corpus-scale work
    is the first hash aggregate (one shuffle on the week key); the
    window then runs over #weeks rows, so its single-partition global
    sort is bounded by the calendar, not the data (~400 weeks at any
    SF — the documented exception to the no-global-window rule).
    Exact decimal revenue; the ratio is one shared double division."""
    o = load_table(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.date_trunc("week", F.col("o_orderdate").cast("date")).alias("week_ts")
    ).agg(dsum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
    w = Window.orderBy("week_ts")
    prev = F.lag("revenue").over(w)
    return weekly.select(
        F.col("week_ts").cast("date").alias("week_start"),
        "n_orders",
        "revenue",
        prev.alias("prev_revenue"),
        ((F.col("revenue") - prev) / prev).alias("wow_change"),
    )


@register(
    "daily_event_type_pivot",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(count_if(event_type = 'click') AS BIGINT) AS click,
       CAST(count_if(event_type = 'view') AS BIGINT) AS view,
       CAST(count_if(event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count_if(event_type = 'signup') AS BIGINT) AS signup,
       CAST(count_if(event_type = 'error') AS BIGINT) AS error
FROM events
GROUP BY day
""",
    tags=("X18", "X14", "X5"),
)
def daily_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily wide-format event matrix — pivot on a LOW-CARDINALITY
    explicit value list (the monitoring-dashboard shape). The value
    list is pinned (pivot('event_type', [...]) not the discover-values
    two-pass form), so the plan is a single hash aggregate with five
    conditional counters — one shuffle on the day key, map-side
    combinable, no second job to enumerate distinct values; at 100 TB
    the discovery pass is the difference between one scan and two."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase", "signup", "error"])
    )
