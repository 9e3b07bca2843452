"""Connected-components semantics on known graphs."""

from __future__ import annotations

from master_airflow_spark.operators.clusters import connected_components


def _cc(spark, edge_list, vertex_ids):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    vertices = spark.createDataFrame([(v,) for v in vertex_ids], "id long")
    return {
        r.id: r.component for r in connected_components(edges, vertices).collect()
    }


def test_two_components(spark):
    comp = _cc(spark, [(1, 2), (2, 3), (10, 11)], [1, 2, 3, 10, 11, 99])
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_chain_converges_past_one_hop(spark):
    # a 6-node path: min label must propagate the full diameter
    edges = [(i, i + 1) for i in range(1, 6)]
    comp = _cc(spark, edges, list(range(1, 7)))
    assert set(comp.values()) == {1}


def test_cycle(spark):
    comp = _cc(spark, [(5, 6), (6, 7), (7, 5)], [5, 6, 7])
    assert set(comp.values()) == {5}


def test_deep_chain_beyond_max_iterations(spark):
    # a 40-node path has diameter 39 > MAX_ITERATIONS=20: plain
    # one-hop hash-min would return silently un-converged labels
    # (node 40 stuck at label 20 after 20 rounds). Pointer jumping
    # must converge it in O(log diameter) rounds.
    edges = [(i, i + 1) for i in range(1, 40)]
    comp = _cc(spark, edges, list(range(1, 41)))
    assert set(comp.values()) == {1}


def test_dedup_clusters_canonicals(spark, sf_dir):
    from master_airflow_spark.operators.clusters import dedup_clusters

    out = dedup_clusters(spark, sf_dir).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rows in by_cluster.items():
        canon = [r for r in rows if r.is_canonical]
        assert len(canon) == 1, f"cluster {cid}: exactly one canonical"
        assert canon[0].doc_id == min(r.doc_id for r in rows)
        assert all(r.cluster_size == len(rows) for r in rows)
        assert len(rows) >= 2  # singletons excluded