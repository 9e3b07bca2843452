"""Graph analytics over relational data — fixed-iteration PageRank.

The reference has no graph surface at all (SURVEY.md §2.7 verified
absence); this is capability closure for the link-analysis side of a
training-data pipeline (rank hosts/documents by citation structure to
weight a crawl, the CommonCrawl-style use). The graph here is the
bipartite customer↔supplier trade graph induced by orders⋈lineitem —
the densest link structure the test schema offers.

Determinism contract: classic PageRank is float arithmetic whose
accumulation order differs between Spark's parallel partial sums and
DuckDB's single-threaded fold. We therefore run the whole iteration in
SCALED INTEGER space (rank × 10^12 as BIGINT, floor division for the
per-edge contribution and the damping terms). Every operation is
exact and order-independent, so three unrolled iterations produce
bit-identical BIGINT ranks in both engines — same convergence
behavior, zero float drift. At 100 TB the per-iteration shape is: one
shuffle of the (small) rank table joined to the edge list partitioned
by src, then a hash aggregate on dst — ranks stay node-sized (≪ edge
list), and the edge list's partitioning is reused across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.registry import register

# Rank fixed-point scale: 10^12 keeps three damped iterations well
# inside BIGINT range (sum over all nodes stays ~10^12 × node-count).
_SCALE = 1_000_000_000_000
_ITERS = 3

_PAGERANK_ORACLE = f"""
WITH trade AS (
    SELECT DISTINCT o.o_custkey AS custkey, l.l_suppkey AS suppkey
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (  -- bidirectional: customer*2 <-> supplier*2+1
    SELECT custkey * 2 AS src, suppkey * 2 + 1 AS dst FROM trade
    UNION ALL
    SELECT suppkey * 2 + 1 AS src, custkey * 2 AS dst FROM trade
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
p0 AS (
    SELECT node, {_SCALE} // (SELECT count(*) FROM nodes) AS rank
    FROM nodes
),
i1 AS (
    SELECT e.dst AS node, CAST(SUM(p.rank // d.outdeg) AS BIGINT) AS inflow
    FROM edges e
    JOIN p0 p ON p.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
),
p1 AS (
    SELECT n.node,
           (15 * ({_SCALE} // (SELECT count(*) FROM nodes))) // 100
           + (85 * COALESCE(i.inflow, 0)) // 100 AS rank
    FROM nodes n LEFT JOIN i1 i ON i.node = n.node
),
i2 AS (
    SELECT e.dst AS node, CAST(SUM(p.rank // d.outdeg) AS BIGINT) AS inflow
    FROM edges e
    JOIN p1 p ON p.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
),
p2 AS (
    SELECT n.node,
           (15 * ({_SCALE} // (SELECT count(*) FROM nodes))) // 100
           + (85 * COALESCE(i.inflow, 0)) // 100 AS rank
    FROM nodes n LEFT JOIN i2 i ON i.node = n.node
),
i3 AS (
    SELECT e.dst AS node, CAST(SUM(p.rank // d.outdeg) AS BIGINT) AS inflow
    FROM edges e
    JOIN p2 p ON p.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
),
p3 AS (
    SELECT n.node,
           (15 * ({_SCALE} // (SELECT count(*) FROM nodes))) // 100
           + (85 * COALESCE(i.inflow, 0)) // 100 AS rank
    FROM nodes n LEFT JOIN i3 i ON i.node = n.node
)
SELECT node, rank AS rank_scaled,
       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind
FROM p3
ORDER BY rank_scaled DESC, node
LIMIT 25
"""


@register("pagerank_trade_graph", oracle=_PAGERANK_ORACLE, tags=("X28", "graph"))
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 PageRank over the bipartite customer↔supplier trade
    graph, three damped iterations (d=0.85) in scaled-integer space.

    Scale posture: the edge list (the 100 TB-side object) is built
    once with a single orders⋈lineitem shuffle and DISTINCT, then
    cached for the three iterations — each iteration joins the
    node-sized rank table to it (broadcast-eligible: ranks ≈ #nodes ≪
    #edges) and hash-aggregates inflow by dst with map-side combine.
    Nothing driver-side; the final top-25 is a
    TakeOrderedAndProject."""
    from master_airflow_spark.registry import track_cache

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    trade = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    edges = track_cache(
        trade.select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        ).unionAll(
            trade.select(
                (F.col("l_suppkey") * 2 + 1).alias("src"),
                (F.col("o_custkey") * 2).alias("dst"),
            )
        )
    )
    nodes = track_cache(edges.select(F.col("src").alias("node")).distinct())
    n_nodes = nodes.count()  # scalar cardinality, not data collection
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # edges⋈deg is iteration-invariant: precompute once and cache so
    # each of the three iterations only joins the rank table to it.
    edeg = track_cache(edges.join(deg, "src"))

    base = F.lit((15 * (_SCALE // n_nodes)) // 100)
    # "pr" not "rank": bare `rank` inside F.expr would shadow the
    # window function name during SQL parsing.
    ranks = nodes.withColumn("pr", F.lit(_SCALE // n_nodes))
    for _ in range(_ITERS):
        inflow = (
            edeg.join(F.broadcast(ranks), edeg.src == ranks.node)
            .select(
                F.col("dst"),
                F.expr("pr div outdeg").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = nodes.join(inflow, nodes.node == inflow.dst, "left").select(
            "node",
            (base + F.expr("85 * coalesce(inflow, 0) div 100")).alias("pr"),
        )
    out = ranks.select(
        "node",
        F.col("pr").alias("rank_scaled"),
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
    )
    return out.orderBy(F.desc("rank_scaled"), "node").limit(25)
