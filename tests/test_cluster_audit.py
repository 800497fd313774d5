"""Cluster edge audit: clique / chain / singleton / external-edge cases."""

from __future__ import annotations

from fel_spark.operators.evalmetrics import cluster_edge_audit


def test_cluster_audit_hand_computed(spark):
    # cluster 1 = {1,2,3}: chain 1-2-3 (CC would merge, but 1-3 missing)
    # cluster 2 = {4,5}: clique (one edge)
    # cluster 3 = {6}: singleton
    # edge 3-4 crosses clusters 1 and 2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (3, 4)], "src long, dst long"
    )
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 3)],
        "id long, cluster_id long",
    )
    out = {r["cluster_id"]: r for r in cluster_edge_audit(edges, assign).collect()}
    c1 = out[1]
    assert (c1["n_nodes"], c1["n_edges"], c1["n_possible"]) == (3, 2, 3)
    assert c1["density_micro"] == 666667
    assert c1["is_clique"] is False and c1["n_external"] == 1
    c2 = out[2]
    assert (c2["n_edges"], c2["n_possible"]) == (1, 1)
    assert c2["is_clique"] is True and c2["n_external"] == 1
    c3 = out[3]
    assert c3["n_nodes"] == 1 and c3["n_edges"] == 0
    assert c3["density_micro"] is None and c3["is_clique"] is True
    assert c3["n_external"] == 0


def test_cluster_audit_all_clusters_surface(spark):
    # clusters with zero edges anywhere still appear (left joins)
    edges = spark.createDataFrame([], "src long, dst long")
    assign = spark.createDataFrame(
        [(i, i % 3) for i in range(9)], "id long, cluster_id long"
    )
    out = cluster_edge_audit(edges, assign).collect()
    assert len(out) == 3
    assert all(r["n_edges"] == 0 and r["n_external"] == 0 for r in out)
    assert all(r["is_clique"] is False for r in out)  # 3 possible, 0 present
