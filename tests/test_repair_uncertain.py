"""Cluster repair (weak-member ejection) + uncertainty sampling."""

from __future__ import annotations

from fel_spark.operators.cluster import repair_clusters
from fel_spark.operators.linkage import uncertain_pairs


def test_repair_ejects_chained_member(spark):
    """Cluster {1,2,3,9}: 1-2-3 is a triangle-ish core, 9 hangs off one
    spurious edge to 3. At min_support 500000 (half the members), 9 is
    ejected to a singleton; survivors keep label 1."""
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 1), (20, 20)], ["id", "cluster"]
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 9)], ["src", "dst"]
    )
    got = {
        r["id"]: (r["support_micro"], r["ejected"], r["repaired_cluster"])
        for r in repair_clusters(assign, edges, 500_000).collect()
    }
    # degrees within cluster of size 4: 1->2, 2->2, 3->3, 9->1
    assert got[1] == (666_666, False, 1)
    assert got[3] == (1_000_000, False, 1)
    assert got[9] == (333_333, True, 9)
    # singleton untouched, full support by convention
    assert got[20] == (1_000_000, False, 20)


def test_repair_relabels_when_min_member_ejected(spark):
    """If the min-id member is the weak one, survivors get a NEW
    canonical label (min surviving id)."""
    assign = spark.createDataFrame(
        [(1, 1), (5, 1), (6, 1), (7, 1)], ["id", "cluster"]
    )
    edges = spark.createDataFrame(
        [(5, 6), (6, 7), (5, 7), (1, 5)], ["src", "dst"]
    )
    got = {
        r["id"]: (r["ejected"], r["repaired_cluster"])
        for r in repair_clusters(assign, edges, 500_000).collect()
    }
    assert got[1] == (True, 1)
    assert got[5] == (False, 5) and got[6] == (False, 5) and got[7] == (False, 5)


def test_uncertain_pairs_global_and_strata(spark):
    scored = spark.createDataFrame(
        [
            ("a", "b", "x", 9000),
            ("a", "c", "x", 7900),
            ("a", "d", "y", 8100),
            ("b", "c", "y", 2000),
            ("b", "d", "y", 8050),
        ],
        ["id_a", "id_b", "blk", "score_micro"],
    )
    # global top-2 around threshold 8000: margins 1000,100,100,6000,50
    top = uncertain_pairs(scored, 8000, 2).collect()
    assert [(r["id_a"], r["id_b"], r["margin_micro"]) for r in top] == [
        ("b", "d", 50),
        ("a", "c", 100),
    ]
    # per-stratum top-1
    per = {
        (r["blk"]): (r["id_a"], r["id_b"])
        for r in uncertain_pairs(scored, 8000, 1, strata_col="blk").collect()
    }
    assert per == {"x": ("a", "c"), "y": ("b", "d")}
    # deterministic tie-break on equal margins: (a,c) before (a,d)
    tie = uncertain_pairs(scored, 8000, 5).collect()
    ranks = {(r["id_a"], r["id_b"]): r["sel_rank"] for r in tie}
    assert ranks[("a", "c")] == 2 and ranks[("a", "d")] == 3
