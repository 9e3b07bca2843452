"""Semantic-law tests for the round-4 second batch: PageRank,
Simpson diversity, inverted index, last-touch attribution, equi-depth
buckets. The exact-value certification lives in the DuckDB
differential harness (test_oracle.py); these pin the semantics the
hash comparison can't express (invariants, cross-column laws,
join-back consistency)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pagerank_laws(spark, sf_dir):
    from master_airflow_spark.operators.graph import _SCALE, pagerank_trade_graph
    from master_airflow_spark.registry import release_caches

    rows = pagerank_trade_graph(spark, sf_dir).collect()
    release_caches()
    assert len(rows) == 25
    nodes = [r.node for r in rows]
    assert len(set(nodes)) == 25
    # every rank carries at least the teleport term (base > 0.15/N
    # scaled, minus floor-division slack)
    assert all(r.rank_scaled > 0 for r in rows)
    # ranks sorted desc with node tiebreaker — the output total order
    pairs = [(-r.rank_scaled, r.node) for r in rows]
    assert pairs == sorted(pairs)
    # on the bipartite trade graph suppliers are the hubs (every
    # customer links to many suppliers, few suppliers total), so the
    # top of the ranking must be supplier-dominated
    assert rows[0].kind == "supplier"
    sup = [r.rank_scaled for r in rows if r.kind == "supplier"]
    cus = [r.rank_scaled for r in rows if r.kind == "customer"]
    if sup and cus:
        assert min(sup) > max(cus)


def test_pagerank_mass_approximately_conserved(spark, sf_dir):
    """Total rank mass stays ~= _SCALE across iterations: damping
    redistributes 15% to teleport and floor division only ever loses
    mass (≤1 unit per edge/node op), never creates it."""
    from master_airflow_spark.operators.graph import _SCALE, pagerank_trade_graph
    from master_airflow_spark.registry import release_caches

    df = pagerank_trade_graph(spark, sf_dir)
    total_top25 = sum(r.rank_scaled for r in df.collect())
    release_caches()
    assert 0 < total_top25 <= _SCALE


def test_simpson_diversity_bounds(spark, sf_dir):
    from master_airflow_spark.operators.text import token_simpson_diversity

    bad = (
        token_simpson_diversity(spark, sf_dir)
        .where(
            (F.col("n_distinct_toks") > F.col("n_toks"))
            | (F.col("simpson_index") > 1.0)
            # sum p_i^2 is minimized by the uniform distribution:
            # >= 1/n_distinct always
            | (F.col("simpson_index") * F.col("n_distinct_toks") < 1.0 - 1e-12)
            | (F.col("simpson_index") <= 0.0)
        )
        .count()
    )
    assert bad == 0


def test_inverted_index_postings_consistent(spark, sf_dir):
    from master_airflow_spark.operators.retrieval import inverted_index_postings

    rows = inverted_index_postings(spark, sf_dir).collect()
    assert rows, "df>=3 terms must exist"
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert len(ids) == r.doc_freq >= 3
        assert ids == sorted(ids)
        assert len(set(ids)) == len(ids), "postings must be distinct docs"


def test_last_touch_attribution_joins_back(spark, sf_dir):
    """Every attributed click must be a real click event by the same
    user at last_click_ts == purchase_ts - gap, inside the 7-day
    window; unattributed purchases carry NULL in both columns."""
    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.operators.attribution import last_touch_attribution

    att = last_touch_attribution(spark, sf_dir)
    # null columns move together
    assert (
        att.where(F.col("click_id").isNull() != F.col("gap_us").isNull()).count() == 0
    )
    attributed = att.where(F.col("click_id").isNotNull())
    assert attributed.where(
        (F.col("gap_us") < 0) | (F.col("gap_us") > 7 * 24 * 3600 * 1_000_000)
    ).count() == 0
    clicks = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("cu"),
            F.col("ts").alias("click_ts"),
        )
    )
    joined = attributed.join(clicks, "click_id", "left")
    assert joined.where(F.col("cu").isNull()).count() == 0, "click_id not a click"
    assert joined.where(F.col("cu") != F.col("user_id")).count() == 0
    # gap arithmetic consistent with the click's actual timestamp
    bad_gap = joined.where(
        F.unix_micros(F.col("purchase_ts").cast("timestamp"))
        - F.unix_micros(F.col("click_ts").cast("timestamp"))
        != F.col("gap_us")
    ).count()
    assert bad_gap == 0


def test_last_touch_attribution_covers_all_purchases(spark, sf_dir):
    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.operators.attribution import last_touch_attribution

    n_purchases = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert last_touch_attribution(spark, sf_dir).count() == n_purchases


def test_equi_depth_buckets_laws(spark, sf_dir):
    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.operators.stats import equi_depth_price_buckets

    rows = sorted(equi_depth_price_buckets(spark, sf_dir).collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(1, 11))
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == total
    # equi-depth: tile sizes differ by at most one, big tiles first
    sizes = [r.n_orders for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)
    # value ranges are non-overlapping and ordered
    for a, b in zip(rows, rows[1:]):
        assert a.max_price <= b.min_price


def test_mad_outliers_laws(spark, sf_dir):
    """MAD is translation-robust: the robust z-score marks a bounded
    fraction of points, never the majority; median lies inside
    [min, max]; mad >= 0; outlier count < half the group."""
    from master_airflow_spark.operators.robust_stats import mad_robust_outliers

    rows = mad_robust_outliers(spark, sf_dir).collect()
    assert len(rows) == 5  # five order priorities
    for r in rows:
        assert r.mad_cents >= 0
        assert 0 <= r.n_outliers < r.n_orders / 2
        # cents medians are exact halves: 2*med is integral
        assert float(2 * r.median_cents).is_integer()
        assert float(4 * r.mad_cents).is_integer()


def test_source_token_divergence_laws(spark, sf_dir):
    """TV distance is a metric on distributions: 0 <= tv <= 1; a
    source identical to the corpus scores 0; sources partition the
    corpus, so sum over sources of ns*tv relates to total variation
    mass but each individual tv is strictly < 1 here (every source
    shares some tokens with the corpus)."""
    from master_airflow_spark.operators.text import source_token_divergence
    from master_airflow_spark.registry import release_caches

    rows = source_token_divergence(spark, sf_dir).collect()
    release_caches()
    assert rows
    for r in rows:
        assert 0.0 <= r.tv_divergence < 1.0
        assert r.n_tokens > 0


def test_nation_revenue_trend_matches_numpy(spark, sf_dir):
    """Cross-check one nation's slope against an independent numpy
    polyfit on the same daily aggregates."""
    import numpy as np

    from master_airflow_spark.operators.stats import nation_revenue_trend
    from master_airflow_spark.testing import duckdb_connection

    rows = {r.n_name: r for r in nation_revenue_trend(spark, sf_dir).collect()}
    assert len(rows) == 25
    con = duckdb_connection(sf_dir)
    name = sorted(rows)[0]
    daily = con.execute(
        """
        SELECT date_diff('day', DATE '1992-01-01', CAST(o.o_orderdate AS DATE)) AS x,
               SUM(o.o_totalprice) AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE n.n_name = ?
        GROUP BY x
        """,
        [name],
    ).fetchall()
    con.close()
    xs = np.array([r[0] for r in daily], dtype=float)
    ys = np.array([r[1] for r in daily], dtype=float)
    slope = np.polyfit(xs, ys, 1)[0]
    got = rows[name].slope_per_day
    assert abs(got - slope) <= max(1e-6, 1e-6 * abs(slope)), (got, slope)
    assert rows[name].n_days == len(daily)


def test_cluster_keep_longest_laws(spark, sf_dir):
    """The kept doc must be a member of its cluster with the maximal
    n_chars; n_dropped = cluster size - 1 >= 1 (singletons excluded)."""
    from master_airflow_spark.operators.clusters import (
        cluster_keep_longest,
        dedup_clusters,
    )
    from master_airflow_spark.registry import release_caches

    kept = {r.cluster_id: r for r in cluster_keep_longest(spark, sf_dir).collect()}
    release_caches()
    members = {}
    for r in dedup_clusters(spark, sf_dir).collect():
        members.setdefault(r.cluster_id, []).append(r.doc_id)
    release_caches()
    assert set(kept) == set(members)
    from master_airflow_spark.catalog import load_table

    n_chars = dict(
        load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    )
    for cid, r in kept.items():
        assert r.kept_doc_id in members[cid]
        assert r.n_dropped == len(members[cid]) - 1 >= 1
        best = max(members[cid], key=lambda d: (n_chars[d], -d))
        assert r.kept_doc_id == best
        assert r.kept_n_chars == n_chars[best]


def test_merge_changes_classify_laws(spark, sf_dir):
    """Action classes partition the changes keyset; INSERT keys must
    not exist in the state window; counts are positive."""
    from master_airflow_spark.operators.dedup import merge_changes_classify

    rows = {r.action: r for r in merge_changes_classify(spark, sf_dir).collect()}
    assert set(rows) <= {"INSERT", "UPDATE", "NOOP"}
    assert rows, "changes batch must be non-empty"
    for r in rows.values():
        assert r.n_keys > 0
        assert r.sum_new_value is not None


def test_event_type_association_laws(spark, sf_dir):
    """Support symmetry (n_both(a,b) == n_both(b,a)), confidence in
    (0,1], and the lift identity lift(a,b) == lift(b,a)."""
    from master_airflow_spark.operators.stats import event_type_association
    from master_airflow_spark.registry import release_caches

    rows = {(r.antecedent, r.consequent): r for r in
            event_type_association(spark, sf_dir).collect()}
    release_caches()
    assert rows
    for (a, b), r in rows.items():
        assert a != b
        assert 0 < r.confidence <= 1
        mirror = rows[(b, a)]
        assert mirror.n_both == r.n_both
        assert abs(mirror.lift - r.lift) < 1e-12


def test_twap_bounds_and_weights(spark, sf_dir):
    """TWAP lies within [min value, max value] per user; total_us
    equals the user's observed time span; interval count = events-1."""
    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.operators.stats import twap_user_value

    got = {r.user_id: r for r in twap_user_value(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            ).alias("span_us"),
        )
        .collect()
    )
    for r in ev:
        if r.n < 2:
            assert r.user_id not in got
            continue
        g = got[r.user_id]
        assert g.n_intervals == r.n - 1
        assert g.total_us == r.span_us
        # integer-cents rounding can nudge twap 0.005 past the extremes
        assert r.lo - 0.01 <= g.twap <= r.hi + 0.01


def test_prefix_containment_is_strict_prefix(spark, sf_dir):
    """Every reported pair must satisfy short.text == prefix(long.text)
    with strictly smaller length; pairs are irreflexive and
    direction-consistent."""
    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.operators.dedup import prefix_containment_pairs

    texts = dict(
        load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    )
    rows = prefix_containment_pairs(spark, sf_dir).collect()
    assert rows, "synthetic corpus contains truncation dups"
    for r in rows:
        assert r.short_id != r.long_id
        assert r.short_chars < r.long_chars
        assert texts[r.long_id].startswith(texts[r.short_id])


def test_winsorized_mean_laws(spark, sf_dir):
    """Winsorized mean lies between the clip bounds; clipped counts
    are ~5% tails (<= 6% with interpolation slack); plain mean of a
    clamped sample is pulled toward the median vs the raw mean when
    the raw distribution has a heavier right tail."""
    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.operators.robust_stats import winsorized_mean_price

    rows = winsorized_mean_price(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_floor_clipped <= 0.06 * r.n_orders
        assert r.n_ceil_clipped <= 0.06 * r.n_orders
        assert r.winsorized_mean_c > 0
    raw = {
        x.o_orderpriority: x.m
        for x in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg((F.avg(F.col("o_totalprice")) * 100).alias("m"))
        .collect()
    }
    for r in rows:
        # clamping both tails keeps the mean within ~the raw mean's
        # neighborhood — sanity against unit mixups (cents vs dollars)
        assert 0.5 * raw[r.o_orderpriority] < r.winsorized_mean_c < 1.5 * raw[r.o_orderpriority]


def test_multi_touch_consistent_with_last_touch(spark, sf_dir):
    """Cross-operator law: a purchase has an attributed last-touch
    click IFF its trailing-7d click count is >= 1 — the two
    attribution operators must agree on the candidate window."""
    from master_airflow_spark.operators.attribution import (
        last_touch_attribution,
        multi_touch_window_count,
    )

    last = {
        r.purchase_id: r.click_id
        for r in last_touch_attribution(spark, sf_dir).collect()
    }
    multi = {
        r.purchase_id: r.n_touches_7d
        for r in multi_touch_window_count(spark, sf_dir).collect()
    }
    assert set(last) == set(multi)
    for pid, click in last.items():
        assert (click is not None) == (multi[pid] >= 1), pid


def test_weekly_revenue_wow_laws(spark, sf_dir):
    """First week has NULL prev/wow; revenue identity holds: sum of
    weekly revenue equals total; wow ratios reconstruct revenue."""
    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.operators.stats import weekly_revenue_wow

    rows = sorted(weekly_revenue_wow(spark, sf_dir).collect(), key=lambda r: r.week_start)
    assert rows[0].prev_revenue is None and rows[0].wow_change is None
    for a, b in zip(rows, rows[1:]):
        assert b.prev_revenue == a.revenue
        assert abs(b.wow_change - (b.revenue - a.revenue) / a.revenue) < 1e-12
    total = sum(r.revenue for r in rows)
    orders_total = (
        load_table(spark, sf_dir, "orders")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,4)")).cast("double"))
        .first()[0]
    )
    assert abs(total - orders_total) < 1e-6 * abs(orders_total)


def test_sentence_segmentation_crafted(spark, tmp_path):
    """Multi-sentence splitting with stable ordinals on crafted text
    (the driver corpus has no punctuation, so the registry query only
    certifies the plumbing; this runs the REAL operator against a
    crafted documents table so a regex change in the operator fails
    HERE, not just in a copied expression)."""
    from master_airflow_spark.operators.text import sentence_segmentation

    crafted = spark.createDataFrame(
        [
            (1, "One two. Three four! Five?  Six.", "en", "a", 33),
            (2, "NoPunctuationHere", "en", "a", 17),
            (3, "Trailing dot.", "en", "a", 13),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    crafted.write.parquet(f"{sf_dir}/documents.parquet")
    out = sentence_segmentation(spark, sf_dir).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.sentence))
    assert by_doc[1] == [(0, "One two"), (1, "Three four"), (2, "Five"), (3, "Six.")]
    assert by_doc[2] == [(0, "NoPunctuationHere")]
    # terminal punctuation with no following whitespace does not split:
    # the delimiter is punctuation + whitespace (end-of-string keeps it)
    assert by_doc[3] == [(0, "Trailing dot.")]


def test_ann_recall_eval_bounds(spark, sf_dir):
    """Recall in [0,1]; one row per exact-ground-truth query; mean
    recall is positive (the LSH index must find SOMETHING at these
    parameters)."""
    from master_airflow_spark.operators.similarity import (
        MAX_QUERIES,
        TOP_K,
        ann_recall_eval,
    )
    from master_airflow_spark.registry import release_caches

    rows = ann_recall_eval(spark, sf_dir).collect()
    release_caches()
    assert 0 < len(rows) <= MAX_QUERIES
    assert len({r.q_id for r in rows}) == len(rows)
    for r in rows:
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_hits == round(r.recall_at_k * TOP_K)
    assert sum(r.recall_at_k for r in rows) > 0


def test_shipping_latency_percentile_laws(spark, sf_dir):
    from master_airflow_spark.operators.robust_stats import shipping_latency_percentiles

    rows = shipping_latency_percentiles(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.p50_latency_days <= r.p75_latency_days <= r.max_latency_days
        assert 0.0 <= r.slow_frac <= 1.0
        # dyadic interpolation: quarters exactly
        assert float(4 * r.p50_latency_days).is_integer()
        assert float(4 * r.p75_latency_days).is_integer()


def test_dedup_rate_consistent_with_dedup_exact(spark, sf_dir):
    """Sum of per-source distinct counts >= global distinct count
    (same content can appear in two sources); per-source dup_rate
    reproduces from the counts; rates in [0,1)."""
    from master_airflow_spark.operators.dedup import (
        dedup_exact,
        dedup_rate_by_source,
    )

    rows = dedup_rate_by_source(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_distinct <= r.n_docs
        assert abs(r.dup_rate - (r.n_docs - r.n_distinct) / r.n_docs) < 1e-12
    global_distinct = dedup_exact(spark, sf_dir).count()
    assert sum(r.n_distinct for r in rows) >= global_distinct
    assert sum(r.n_docs for r in rows) >= global_distinct
