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

import os

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


# ---------------------------------------------------------------------------
# Triangle counting (co-supplier graph)


# One month of orders keeps the co-supplier graph in the sparse regime
# the algorithm is designed for (an unfiltered month-less graph on the
# synthetic data saturates toward the complete graph, where Θ(n³)
# output makes ANY triangle algorithm cubic — no engine fixes that).
_TRI_WINDOW = ("1995-03-01", "1995-04-01")

_TRIANGLE_ORACLE = f"""
WITH pairs AS (
    SELECT DISTINCT l.l_orderkey AS okey, l.l_suppkey AS s
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= DATE '{_TRI_WINDOW[0]}'
      AND o.o_orderdate <  DATE '{_TRI_WINDOW[1]}'
),
edges AS (
    SELECT DISTINCT a.s AS u, b.s AS v
    FROM pairs a JOIN pairs b ON a.okey = b.okey AND a.s < b.s
)
SELECT
    (SELECT count(*) FROM (
        SELECT u AS node FROM edges UNION SELECT v FROM edges)) AS n_nodes,
    (SELECT count(*) FROM edges) AS n_edges,
    (SELECT count(*)
     FROM edges e1
     JOIN edges e2 ON e2.u = e1.v
     JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
"""


@register("triangle_count_cosuppliers", oracle=_TRIANGLE_ORACLE, tags=("X28", "graph"))
def triangle_count_cosuppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count over the co-supplier graph (two suppliers
    are adjacent iff they ship line items on the same order) for one
    month of orders — the clustering-structure statistic PageRank and
    connected components don't see.

    Integer-only counting, so the oracle matches bit-exactly.

    Algorithm: every edge is stored once in canonical orientation
    u < v; a triangle {a < b < c} is counted exactly once as the
    wedge (a,b)+(b,c) closed by (a,c) — three self-equi-joins on the
    oriented edge list, the standard distributed formulation
    (node-iterator-in-joins). Scale posture: the month filter pushes
    to the orders scan (partition pruning on a date-partitioned
    layout); per-order supplier pairs are bounded by the order's line
    count squared (TPC-H-like ≤ 7 lines ⇒ ≤ 21 pairs) so the pair
    explosion is linear in lineitem; the wedge join's intermediate is
    Σ_v indeg(v)·outdeg(v) under the u<v orientation, the quantity a
    degree-ordered orientation would minimize on a skewed real graph
    (swap the `<` for a (degree, id) total order when hub nodes
    appear — same plan shape, one extra degree join). The edge list
    feeds three join sides, hence the tracked cache."""
    from master_airflow_spark.registry import track_cache

    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_TRI_WINDOW[0]).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_TRI_WINDOW[1]).cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    pairs = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = pairs.select(F.col("okey"), F.col("s").alias("u"))
    b = pairs.select(F.col("okey").alias("okey_b"), F.col("s").alias("v"))
    edges = track_cache(
        a.join(b, (a.okey == b.okey_b) & (F.col("u") < F.col("v")))
        .select("u", "v")
        .distinct()
    )
    e1 = edges.select(F.col("u").alias("t_a"), F.col("v").alias("t_b"))
    e2 = edges.select(F.col("u").alias("w_b"), F.col("v").alias("t_c"))
    e3 = edges.select(F.col("u").alias("c_a"), F.col("v").alias("c_c"))
    triangles = (
        e1.join(e2, F.col("t_b") == F.col("w_b"))
        .join(e3, (F.col("t_a") == F.col("c_a")) & (F.col("t_c") == F.col("c_c")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    # three single-row aggregates — the crossJoins are 1×1×1
    return nodes.crossJoin(n_edges).crossJoin(triangles)


# ---------------------------------------------------------------------------
# Bounded multi-source BFS (hop histogram)

_BFS_HOPS = 4
# Broadcast the frontier/visited set while the graph's NODE bound fits
# executor memory as a hash relation (~4M longs ≈ 32MB raw, a few x
# hashed — inside Spark's practical broadcast envelope). Above it the
# loop falls back to shuffle joins; see bfs_reachability_hops.
_BFS_BROADCAST_NODES = 4_000_000

_BFS_ORACLE = f"""
WITH RECURSIVE trade AS (
    SELECT DISTINCT o.o_custkey AS custkey, l.l_suppkey AS suppkey
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
    SELECT custkey * 2 AS src, suppkey * 2 + 1 AS dst FROM trade
    UNION ALL
    SELECT suppkey * 2 + 1 AS src, custkey * 2 AS dst FROM trade
),
bfs(node, hop) AS (
    SELECT s_suppkey * 2 + 1, 0 FROM supplier WHERE s_suppkey % 10 = 1
    UNION
    SELECT e.dst, b.hop + 1
    FROM bfs b JOIN edges e ON e.src = b.node
    WHERE b.hop < {_BFS_HOPS}
),
dist AS (SELECT node, min(hop) AS hop FROM bfs GROUP BY node)
SELECT hop, count(*) AS n_nodes FROM dist GROUP BY hop ORDER BY hop
"""


@register("bfs_reachability_hops", oracle=_BFS_ORACLE, tags=("X28", "graph"))
def bfs_reachability_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source BFS on the bipartite trade graph: seed at
    every 10th supplier (a deterministic seed set that is non-empty at
    every scale factor), expand {_BFS_HOPS} hops, return the hop
    histogram (how many nodes are first reached at each distance) —
    the reachability/diameter probe of the graph family. Oracle is a
    recursive CTE; integer hops, so exact.

    Spark-side: the textbook iterative-frontier formulation — each
    round joins the CURRENT FRONTIER (not the whole visited set) to
    the edge list, anti-joins out already-visited nodes, and unions
    the survivors into the distance table. The edge list is built
    once and cached; each round's frontier is cached (truncating the
    doubling lineage so round k never recomputes round k-1), while
    the visited set stays a union OF those cached frontiers — no
    per-round re-cache of a growing frame.

    Join strategy is size-gated (round-12; the embedding_near_dup
    broadcast-budget idiom): frontier and visited set are bounded by
    the NODE count — |customer| + |supplier|, two cheap metadata
    counts — which is orders smaller than the edge list. When that
    bound fits a broadcast (≤ _BFS_BROADCAST_NODES ≈ tens of MB
    hashed), both per-round joins hash-probe the cached edge scan
    with NO exchange, leaving ONE node-sized shuffle per round (the
    frontier dedup) — measured 12s → ~6s at x10 on local[32], where
    the 3-exchanges-per-round scheduling floor dominated. Past the
    bound (a 100 TB graph: ~10^8+ nodes) the same loop runs shuffle
    joins against the edge partitioning — the plan a frontier that
    can't broadcast needs anyway."""
    from master_airflow_spark.registry import track_cache

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    # Node bound: distinct custkeys ≤ |customer| (≤ |orders| when a
    # fixture ships no customer table — every order carries one key).
    from master_airflow_spark.catalog import table_path

    if os.path.exists(table_path(sf_dir, "customer")):
        cust_bound = load_table(spark, sf_dir, "customer").count()
    else:
        cust_bound = orders.count()
    n_nodes_bound = cust_bound + supplier.count()
    small = n_nodes_bound <= _BFS_BROADCAST_NODES
    hint = F.broadcast if small else (lambda df: df)
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
    frontier = track_cache(
        supplier.where(F.col("s_suppkey") % 10 == 1).select(
            (F.col("s_suppkey") * 2 + 1).alias("node")
        )
    )
    hops = [frontier.withColumn("hop", F.lit(0))]
    for h in range(1, _BFS_HOPS + 1):
        visited = hops[0].select("node")
        for later in hops[1:]:
            visited = visited.unionAll(later.select("node"))
        reached = (
            edges.join(hint(frontier), edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = track_cache(reached.join(hint(visited), "node", "left_anti"))
        hops.append(frontier.withColumn("hop", F.lit(h)))
    dist = hops[0]
    for later in hops[1:]:
        dist = dist.unionAll(later)
    return dist.groupBy("hop").agg(F.count(F.lit(1)).alias("n_nodes")).orderBy("hop")
