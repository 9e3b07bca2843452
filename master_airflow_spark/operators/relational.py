"""Relational closure — joins, aggregations, grouping sets, set ops,
pivot (SURVEY.md §2.7 X1-X7, X12, X18).

The reference has no joins or aggregations at all (§2.7: verified
absence); this module is the capability closure the north star
requires, written the way a 100 TB Spark deployment wants it:

- Dimension joins broadcast explicitly (``F.broadcast``) — region /
  nation / supplier stay KB-to-MB-sized at every SF, so no fact-side
  shuffle ever happens for them.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
  handles skew splitting at runtime.
- Aggregates are hash aggregates with map-side partial combine; judged
  sums are exact and order-independent (functions/exact.py — the
  scaled-long fast path for money columns, DECIMAL for wide
  magnitudes) so parallel combine order can't perturb the result vs
  the single-threaded oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table, table_bytes
from master_airflow_spark.functions.exact import (
    cents,
    dsum,
    lavg_money,
    lsum_money,
    lsum_scaled,
    sql_cents,
    sql_dsum,
    sql_lavg_money,
    sql_lsum_money,
)
from master_airflow_spark.registry import register

# revenue_by_nation's fact-probe broadcast gate: hint the pruned
# (orders ⋈ customer-keys) build side only while the orders parquet is
# under this bound (file metadata — no job). Past it the hint drops and
# the bushy join tree shuffles both fact legs, the only plan that
# works at 100 TB. 64 MB of orders parquet ≈ well under a 10 MB hashed
# relation after the region prune + 2-column projection.
_RBN_BROADCAST_ORDERS_BYTES = 64 << 20

_QTY_C = sql_cents("l_quantity")
_PRICE_C = sql_cents("l_extendedprice")
_DISC_REV_C = f"{_PRICE_C} * (100 - {sql_cents('l_discount')})"


@register(
    "pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_lsum_money(_QTY_C, 1)} AS sum_qty,
       {sql_lsum_money(_PRICE_C, 1)} AS sum_base_price,
       {sql_lsum_money(_DISC_REV_C, 2)} AS sum_disc_price,
       {sql_lavg_money(_QTY_C, 1)} AS avg_qty,
       {sql_lavg_money(_PRICE_C, 1)} AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("X5", "X15"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: single-pass hash aggregate over
    the fact table with pushed date predicate. Two low-cardinality
    group keys → tiny exchange after map-side combine. Money sums run
    on the scaled-long fast path (functions/exact.py: exact integer
    cents, order-independent, no per-row BigDecimal)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    qty = cents("l_quantity")
    price = cents("l_extendedprice")
    disc_rev = price * (F.lit(100) - cents("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        lsum_money(qty, 1, "sum_qty"),
        lsum_money(price, 1, "sum_base_price"),
        lsum_money(disc_rev, 2, "sum_disc_price"),
        lavg_money(qty, 1, "avg_qty"),
        lavg_money(price, 1, "avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "revenue_by_nation",
    oracle=f"""
SELECT n.n_name,
       {sql_lsum_money(f"{sql_cents('l.l_extendedprice')} * (100 - {sql_cents('l.l_discount')})", 2)} AS revenue,
       count(*) AS n_items
FROM customer c
JOIN orders o    ON o.o_custkey = c.c_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN nation n    ON n.n_nationkey = c.c_nationkey
JOIN region r    ON r.r_regionkey = n.n_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY n.n_name
""",
    tags=("X1", "X5"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join across five tables (TPC-H Q5 shape): dims broadcast
    (nation 25 rows, region 5 — the region filter prunes nations
    *before* the fact join), customer⋈orders⋈lineitem shuffle on their
    keys once. Catalyst pushes r_name IN (...) through the join chain.

    Round-16 fact-probe restructure (guide §3.1 build-side choice +
    §2.3 int keys; the q7 idiom): the old left-deep chain
    (c⋈dims)⋈o⋈li made LINEITEM the broadcast BUILD side at bench SF —
    a 600k-row hash relation rebuilt every execution (event-log
    profile: ~280 ms/rep) while a ~90k-row stream probed it. Now the
    pruned (orders ⋈ region-filtered customer keys) leg builds and the
    lineitem fact STREAMS, the aggregate keys on the c_nationkey int
    (not the n_name string), and the nation names attach to the
    10-row aggregate after the exchange, re-merged by name so
    duplicate-name nations would still aggregate exactly as before
    (partial sums are guarded longs; integer addition associative —
    bit-identical, collect-compared and oracle-verified at three SFs).
    The o2 broadcast hint is SIZE-GATED on the orders parquet bytes
    (metadata only, no extra job): past _RBN_BROADCAST_ORDERS_BYTES
    the hint drops and the bushy tree runs the same two fact shuffles
    (o⋈c2 on custkey — region-pruned, orders-cardinality — then li⋈o2
    on orderkey) as the old chain, so the 100 TB shape is unchanged.
    Interleaved prepared-plan A/B at sf0.1: 0.753→0.567 s min-of-8,
    new side won 7/8 pairs."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))).alias("rev"),
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey"
        )
    )
    c2 = customer.join(dims, customer.c_nationkey == dims.n_nationkey).select(
        "c_custkey", "c_nationkey"
    )
    o2 = orders.join(c2, orders.o_custkey == c2.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    if table_bytes(sf_dir, "orders") < _RBN_BROADCAST_ORDERS_BYTES:
        o2 = F.broadcast(o2)
    keyed = (
        lineitem.join(o2, lineitem.l_orderkey == o2.o_orderkey)
        .groupBy("c_nationkey")
        .agg(lsum_scaled(F.col("rev"), "rev_l"), F.count(F.lit(1)).alias("n_l"))
    )
    names = F.broadcast(nation.select("n_nationkey", "n_name"))
    return (
        keyed.join(names, names.n_nationkey == keyed.c_nationkey)
        .groupBy("n_name")
        .agg(
            lsum_money(F.col("rev_l"), 2, "revenue"),
            F.sum("n_l").alias("n_items"),
        )
    )


@register(
    "customer_order_counts",
    oracle="""
SELECT c.c_custkey, c.c_name,
       count(o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(coalesce(o.o_totalprice, 0) AS DECIMAL(28,4))) AS DOUBLE) AS total_spend
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""",
    tags=("X1", "X5"),
)
def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count=0,
    spend=0) — null-handling closure over X1."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)).cast("decimal(28,4)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


@register(
    "semi_anti_customers",
    oracle="""
SELECT c_custkey,
       'has_orders' AS status
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT c_custkey, 'no_orders' AS status
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    tags=("X2", "X12"),
)
def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti joins, labeled and unioned: customers
    partitioned into has-orders / no-orders. Semi/anti ship only the
    probe side's key column through the shuffle."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", F.lit("has_orders").alias("status")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.lit("no_orders").alias("status")
    )
    return semi.unionByName(anti)


@register(
    "range_join_price_bands",
    oracle="""
WITH bands(band, lo, hi) AS (
    VALUES ('budget', 0.0, 50000.0),
           ('mid', 50000.0, 150000.0),
           ('premium', 150000.0, 1000000000.0)
)
SELECT b.band, count(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS band_total
FROM orders o
JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
""",
    tags=("X3",),
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (range) join: fact rows against a tiny in-memory band
    table on a non-equi condition — broadcast nested-loop, the right
    physical plan when one side is rows-not-gigabytes."""
    o = load_table(spark, sf_dir, "orders")
    bands = F.broadcast(
        spark.createDataFrame(
            [
                ("budget", 0.0, 50_000.0),
                ("mid", 50_000.0, 150_000.0),
                ("premium", 150_000.0, 1_000_000_000.0),
            ],
            "band string, lo double, hi double",
        )
    )
    return (
        o.join(bands, (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
            .cast("double")
            .alias("band_total"),
        )
    )


@register(
    "distinct_order_status",
    oracle="""
SELECT o_orderstatus,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY o_orderstatus
""",
    tags=("X6",),
)
def distinct_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct per group (Spark expands to a two-phase
    aggregate under the hood)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@register("approx_distinct_users", oracle=None, tags=("X6",))
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++): the 100 TB answer to
    COUNT(DISTINCT) — mergeable sketches, no exact-distinct shuffle.
    rsd=0.01. Rows-only to the DRIVER (sketch estimates are
    engine-specific, so no hash oracle can exist), but
    property-verified locally: tests/test_round4_ops.py::
    test_approx_distinct_cross_engine pins every estimate within
    3% (≈3σ at rsd=0.01) of DuckDB's exact per-group distinct count —
    a bounded-error oracle, not just a row count."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
    )


@register(
    "approx_distinct_error",
    # Oracle strategy (round-10 verdict #7, the minhash_estimate_error
    # treatment for the HLL family): the sketch ESTIMATE is
    # engine-specific and can never hash-match, so the judged columns
    # are the exact per-group distinct count plus a WITHIN-BOUND flag.
    # Spark computes |approx − exact|/exact ≤ 3·rsd from its own
    # sketch; the oracle's exact side satisfies the bound by identity
    # (TRUE literal). If Spark's estimator ever drifts past 3σ, the
    # flag flips and the driver's value-hash fails — a certified error
    # bound, not just a row count.
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS within_3sigma
FROM events
WHERE user_id IS NOT NULL
GROUP BY event_type
""",
    tags=("X6", "quality"),
)
def approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-bound audit of approx_count_distinct (HLL++, rsd=0.01):
    per event type, the EXACT distinct-user count next to a flag
    asserting the sketch estimate landed within 3·rsd (= 3σ = 3%) of
    it. One pass, one shuffle: both aggregates share the groupBy. HLL
    merge is commutative/idempotent, so the estimate — and therefore
    the flag — is deterministic under any partition order. This is
    the judged companion that turns the rows-only
    ``approx_distinct_users`` into a driver-certified bounded-error
    operator (the role minhash_estimate_error plays for the MinHash
    index)."""
    rsd = 0.01
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
    )
    rel_err = (
        F.abs(F.col("approx_users") - F.col("exact_users")).cast("double")
        / F.col("exact_users")
    )
    return agg.select(
        "event_type",
        "exact_users",
        (rel_err <= F.lit(3 * rsd)).alias("within_3sigma"),
    )


@register(
    "rollup_sales",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       {sql_dsum('l_extendedprice')} AS sales,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("X7",),
)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): detail + per-flag subtotal
    + grand total in one pass, GROUPING() flags disambiguating real
    NULLs from subtotal rows."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            dsum("l_extendedprice", "sales"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "cube_priority_status",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
       count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
    tags=("X7",),
)
def cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all four grouping-set combinations."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_pri"),
            F.grouping("o_orderstatus").cast("int").alias("g_st"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
            .cast("double")
            .alias("total"),
        )
    )


@register(
    "set_ops_customers",
    oracle="""
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
SELECT o_custkey, 'both_years' AS setop FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
UNION ALL
SELECT o_custkey, 'only_1995' AS setop FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
UNION ALL
SELECT o_custkey, 'either_year' AS setop FROM (SELECT * FROM y95 UNION SELECT * FROM y96)
""",
    tags=("X12",),
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION(distinct) over yearly customer sets,
    labeled into one result."""
    o = load_table(spark, sf_dir, "orders")

    def year_keys(y: int) -> DataFrame:
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = year_keys(1995), year_keys(1996)
    return (
        y95.intersect(y96)
        .select("o_custkey", F.lit("both_years").alias("setop"))
        .unionByName(
            y95.exceptAll(y96).select("o_custkey", F.lit("only_1995").alias("setop"))
        )
        .unionByName(
            y95.union(y96)
            .distinct()
            .select("o_custkey", F.lit("either_year").alias("setop"))
        )
    )


@register(
    "agg_collect_arrays",
    oracle="""
SELECT o_orderstatus,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities,
       len(list(DISTINCT o_orderpriority)) AS n_priorities
FROM orders
GROUP BY o_orderstatus
""",
    tags=("X5", "X16"),
)
def agg_collect_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-building aggregates: collect_set per group, sorted for
    determinism (collect order is partition-dependent; the sort makes
    the result a pure function of the group's value set). The judged
    output joins the array to a '|'-delimited string — the driver's
    canonicalizer cannot hash list cells."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_set("o_orderpriority"))).alias(
                "priorities"
            ),
            F.size(F.collect_set("o_orderpriority")).alias("n_priorities"),
        )
    )


PIVOT_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "pivot_priority_by_status",
    oracle="""
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
       count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
       count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
       count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
FROM orders
GROUP BY o_orderstatus
""",
    tags=("X18",),
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: priorities → columns, one count per (status, priority).
    The pivot value list is explicit — at scale an unlisted pivot
    forces an extra distinct-values job; listing it keeps one pass."""
    names = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "not_specified",
        "5-LOW": "low",
    }
    piv = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", PIVOT_PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for empty cells; the FILTERed oracle counts 0
    return piv.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(names[p])
            for p in PIVOT_PRIORITIES
        ],
    )


@register(
    "multiset_set_ops",
    oracle="""
WITH f_bag AS (SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
     o_bag AS (SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O')
SELECT 'common_pairs' AS setop, count(*) AS n_rows,
       count(DISTINCT (o_custkey, o_orderpriority)) AS n_distinct
FROM (SELECT * FROM f_bag INTERSECT ALL SELECT * FROM o_bag)
UNION ALL
SELECT 'f_surplus' AS setop, count(*) AS n_rows,
       count(DISTINCT (o_custkey, o_orderpriority)) AS n_distinct
FROM (SELECT * FROM f_bag EXCEPT ALL SELECT * FROM o_bag)
""",
    tags=("X12",),
)
def multiset_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL / EXCEPT ALL (bag semantics — each
    duplicate occurrence counts) over (customer, priority) pairs of
    finished vs open orders, distinct-set_ops_customers' missing
    sibling: a customer with three finished and two open '1-URGENT'
    orders contributes 2 to the intersection and 1 to the surplus,
    where the distinct forms would say 1 and 0. Both engines implement
    this as a counted hash aggregate, not row pairing — one shuffle
    per bag."""
    o = load_table(spark, sf_dir, "orders")
    f_bag = o.where(F.col("o_orderstatus") == "F").select(
        "o_custkey", "o_orderpriority"
    )
    o_bag = o.where(F.col("o_orderstatus") == "O").select(
        "o_custkey", "o_orderpriority"
    )

    def stats(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("o_custkey", "o_orderpriority").alias("n_distinct"),
        ).select(F.lit(label).alias("setop"), "n_rows", "n_distinct")

    return stats(f_bag.intersectAll(o_bag), "common_pairs").unionByName(
        stats(f_bag.exceptAll(o_bag), "f_surplus")
    )


@register(
    "fuzzy_customer_pairs",
    oracle="""
SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
       a.c_name AS a_name, b.c_name AS b_name,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_dist
FROM customer a
JOIN customer b ON a.c_nationkey = b.c_nationkey
               AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
""",
    tags=("X3", "X13"),
)
def fuzzy_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance entity resolution: same-nation customer pairs
    whose names are within Levenshtein distance 1 — the fuzzy-match
    primitive record-linkage and data-cleaning pipelines run before a
    merge.

    Blocking is the DELETION NEIGHBORHOOD (FastSS, Bocek et al. 2007):
    each name emits itself plus its length single-character-deletion
    variants as candidate keys, and two strings are within Levenshtein
    distance 1 iff they share at least one key (equal → the name
    itself; substitution → the deletion at the differing position;
    insert/delete → the longer one's deletion equals the shorter
    name). Candidates are therefore LOSSLESS for the ≤1 predicate and
    the bucket key's cardinality GROWS WITH THE CORPUS — unlike a
    fixed-cardinality block (nationkey, used here through round 11),
    whose buckets grow linearly with rows and whose in-bucket pair
    count grows quadratically: the round-12 x50 scale probe measured
    exactly that failure (the nation-blocked join ran 10^10 in-bucket
    levenshteins at 50x rows — minutes, vs sub-second for this form).
    Shared keys can only multiply candidates ~name-length-fold, so the
    pair set is output-bound; the exact levenshtein verify runs only
    on DISTINCT candidate pairs. Equality to the quadratic oracle is
    exact by the FastSS theorem (distance-2 pairs sharing a deletion
    are admitted as candidates and then filtered by the verify)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    # name + all single-deletion variants (array_union also dedups the
    # repeated variants a name with equal adjacent chars produces)
    keyed = c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.explode(
            F.array_union(
                F.array(F.col("c_name")),
                F.expr(
                    "transform(sequence(1, length(c_name)), i ->"
                    " concat(substring(c_name, 1, i - 1),"
                    "        substring(c_name, i + 1, length(c_name))))"
                ),
            )
        ).alias("vkey"),
    )
    a = keyed.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        F.col("c_nationkey").alias("nk"),
        "vkey",
    )
    b = keyed.select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_name").alias("b_name"),
        F.col("c_nationkey").alias("bnk"),
        F.col("vkey").alias("bvkey"),
    )
    cand = (
        a.join(
            b,
            (F.col("vkey") == F.col("bvkey"))
            & (F.col("nk") == F.col("bnk"))
            & (F.col("a_key") < F.col("b_key")),
        )
        .select("a_key", "b_key", "a_name", "b_name")
        .distinct()
    )
    return (
        cand.withColumn("edit_dist", F.levenshtein("a_name", "b_name"))
        .where(F.col("edit_dist") <= 1)
        .select("a_key", "b_key", "a_name", "b_name", "edit_dist")
    )


def hll_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL,
    Spark 3.5+): per-event-type user sketches, unioned into a global
    estimate — the re-aggregatable form approx_count_distinct (HLL++,
    one-shot) can't give: partial sketches persist per partition/day
    and roll up later without rescanning, the pattern daily uniques →
    monthly uniques needs at 100 TB. HLL registers are max-merged, so
    the estimate is insertion-order-independent — deterministic across
    cluster layouts — but not SQL-expressible in DuckDB.

    Deliberately UNREGISTERED since round 12 (round-11 verdict #6):
    its registered sibling ``hll_sketch_error`` exercises the exact
    same functions (hll_sketch_agg / hll_union_agg /
    hll_sketch_estimate) with a certified error bound, so a rows-only
    registry slot for the raw estimates bought nothing. The ≤3%
    relative-error bound and the union-vs-flat consistency law stay
    pinned by tests/test_round3_ops.py and test_round4_ops.py, which
    import this function directly."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("est_users"),
    ).unionByName(
        per_type.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
        ).select(F.lit("__all__").alias("event_type"), "est_users")
    )


@register(
    "hll_sketch_error",
    # Same oracle strategy as approx_distinct_error (the round-10
    # verdict's "missing #3": the DataSketches HLL family had no
    # error-bound certification): judged columns are the EXACT distinct
    # counts — per type AND the global rollup, the re-aggregatable path
    # hll_sketch_users exists for — plus a within-bound flag computed
    # from Spark's own sketch estimates; the oracle's exact side
    # satisfies the bound by identity. Estimator drift past 3σ flips
    # the flag and fails the driver's value-hash.
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS exact_users, TRUE AS within_3sigma
FROM events WHERE user_id IS NOT NULL GROUP BY event_type
UNION ALL
SELECT '__all__' AS event_type, count(DISTINCT user_id) AS exact_users,
       TRUE AS within_3sigma
FROM events WHERE user_id IS NOT NULL
""",
    tags=("X6", "quality"),
)
def hll_sketch_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-bound audit of the DataSketches HLL path (hll_sketch_agg /
    hll_union_agg / hll_sketch_estimate): exact distinct users per
    event type and for the unioned global sketch, each with a flag
    asserting the sketch estimate landed within 3σ (σ ≈ 1.04/√2^12 ≈
    1.6% at the default lgConfigK=12 → bound 5%). Covers the UNION
    path specifically — the re-aggregatable capability the one-shot
    approx_count_distinct lacks — so a register-merge regression is
    caught, not just a single-sketch one. One corpus scan: HLL
    insertion is duplicate-insensitive (registers max-merge), so every
    output — per-type exact count, per-type sketch, global exact,
    unioned global sketch — derives from ONE distinct
    (event_type, user_id) pre-aggregation (map-side combinable; at
    100 TB the second full scan a naive exact-global would pay is the
    dominant cost, and the pair set is orders smaller than raw
    events)."""
    bound = 0.05
    # NULL user_id is excluded up front (both engines' DISTINCT
    # semantics skip NULL, and hll_sketch_agg ignores it — the filter
    # keeps the pair-count == count(DISTINCT) identity exact; the
    # oracle filters identically, so a window containing only
    # NULL-user events can't diverge the group sets).
    from master_airflow_spark.registry import track_cache

    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    # Persisted because THREE consumers fold it (per-type agg, global
    # exact, global sketch union) and Catalyst/AQE only reuses some of
    # the exchanges (measured: 1 ReusedExchange, still >1 scan). The
    # pair set is |types|x|users| rows — orders smaller than events —
    # so caching it is the cheap side of the trade at any scale;
    # correctness never depends on the persist (registry contract).
    pairs = track_cache(
        e.groupBy("event_type", "user_id").agg(F.lit(1).alias("one"))
    )
    per_type = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_users"),  # pair rows are distinct
        F.hll_sketch_agg("user_id").alias("sk"),
    )
    # global: exact distinct + sketch union fold from the SAME pair set
    # (count of per-type rows would double-count users spanning types;
    # distinct user_id over the pairs does not).
    g_exact = pairs.agg(F.countDistinct("user_id").alias("exact_users"))
    g_est = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    )

    def flagged(df):
        # est is NULL-coalesced: hll_union_agg over ZERO sketches (an
        # empty or all-NULL-user table) estimates NULL, and the oracle's
        # exact side still emits ('__all__', 0, TRUE) — the zero case
        # must short-circuit the division, not NULL-propagate through
        # it (round-11 review fix; the previous guard was dead).
        est = F.coalesce(F.col("est_users"), F.lit(0))
        rel = F.abs(est - F.col("exact_users")).cast("double") / F.col(
            "exact_users"
        )
        ok = F.when(F.col("exact_users") == 0, est == F.lit(0)).otherwise(
            rel <= F.lit(bound)
        )
        return df.select("event_type", "exact_users", ok.alias("within_3sigma"))

    per = flagged(
        per_type.select(
            "event_type",
            "exact_users",
            F.hll_sketch_estimate("sk").alias("est_users"),
        )
    )
    glob = flagged(
        g_exact.crossJoin(g_est).select(
            F.lit("__all__").alias("event_type"), "exact_users", "est_users"
        )
    )
    return per.unionByName(glob)
