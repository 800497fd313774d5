from __future__ import annotations

from pyspark.sql import functions as F

from fel_spark.operators.collective import (
    collective_scores,
    neighbor_match_evidence,
)


def _edges(spark, und):
    rows = []
    for x, y in und:
        rows += [(x, y), (y, x)]
    return spark.createDataFrame(rows, ["id", "nbr"])


def test_neighbor_match_evidence_hand_case(spark):
    # matched (3,4); N(3)={1,5}, N(4)={2} -> tuples (1,2) and (2,5)
    matched = spark.createDataFrame([(3, 4)], ["id_a", "id_b"])
    edges = _edges(spark, [(3, 1), (3, 5), (4, 2)])
    got = {
        (r["id_a"], r["id_b"]): r["ev"]
        for r in neighbor_match_evidence(matched, edges).collect()
    }
    assert got == {(1, 2): 1, (2, 5): 1}


def test_neighbor_match_evidence_multiplicity_and_self(spark):
    # two matched pairs both bridging (1,2) -> ev 2; na == nb dropped
    matched = spark.createDataFrame([(3, 4), (5, 6)], ["id_a", "id_b"])
    edges = _edges(spark, [(3, 1), (4, 2), (5, 1), (6, 2), (3, 9), (4, 9)])
    got = {
        (r["id_a"], r["id_b"]): r["ev"]
        for r in neighbor_match_evidence(matched, edges).collect()
    }
    assert got[(1, 2)] == 2
    assert (9, 9) not in got
    # (3,4) also bridges (1,9) and (2,9)
    assert got[(1, 9)] == 1 and got[(2, 9)] == 1


def test_collective_scores_two_round_propagation(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 7000), (3, 4, 9000), (5, 6, 7000)],
        ["id_a", "id_b", "base_4dp"],
    )
    edges = _edges(spark, [(1, 3), (2, 4)])
    out = {
        (r["id_a"], r["id_b"]): r
        for r in collective_scores(
            pairs, edges, rounds=2, boost=1500, threshold=8000, cap=10000
        ).collect()
    }
    r12, r34, r56 = out[(1, 2)], out[(3, 4)], out[(5, 6)]
    # round 1: only (3,4) matched at base; its neighborhood bridges (1,2)
    assert (r12["ev_r1"], r12["score_r1_4dp"]) == (1, 8500)
    assert (r34["ev_r1"], r34["score_r1_4dp"]) == (0, 9000)
    # round 2: (1,2) now matched too -> evidence flows back to (3,4), capped
    assert (r34["ev_r2"], r34["score_r2_4dp"]) == (1, 10000)
    assert (r12["ev_r2"], r12["score_r2_4dp"]) == (1, 8500)
    assert r12["matched"] and r34["matched"]
    # isolated pair never moves
    assert (r56["ev_r1"], r56["ev_r2"], r56["matched"]) == (0, 0, False)


def test_collective_scores_round1_pure_function_of_base(spark):
    # with no pair at/above threshold, no evidence ever flows
    pairs = spark.createDataFrame(
        [(1, 2, 7000), (3, 4, 7999)], ["id_a", "id_b", "base_4dp"]
    )
    edges = _edges(spark, [(1, 3), (2, 4)])
    out = collective_scores(pairs, edges, rounds=2).collect()
    assert all(r["ev_r1"] == 0 and r["ev_r2"] == 0 and not r["matched"] for r in out)


def test_collective_scores_broadcast_evidence_and_filter_parity(spark):
    """r6: candidate_filter + broadcast_evidence change only the plan —
    every output row (both rounds' evidence, scores, matched) is
    identical to the default shuffle path."""
    pairs = spark.createDataFrame(
        [(i, j, 9000 - 100 * ((i + j) % 8)) for i in range(0, 30) for j in range(i + 1, 30) if (i % 3) == (j % 3)],
        ["id_a", "id_b", "base_4dp"],
    )
    und = [(i, i + 3) for i in range(0, 27)] + [(i, i + 6) for i in range(0, 24)]
    edges = _edges(spark, und)
    base = collective_scores(pairs, edges, rounds=2).collect()
    fast = collective_scores(
        pairs,
        edges,
        rounds=2,
        candidate_filter=(F.col("id_a") % 3) == (F.col("id_b") % 3),
        broadcast_evidence=True,
    ).collect()
    key = lambda r: (r["id_a"], r["id_b"])
    assert sorted(map(tuple, base)) == sorted(map(tuple, fast))
