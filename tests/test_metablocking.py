"""Meta-blocking: hand-computed JS/WEP, block purging, plan shape."""

from __future__ import annotations

from fel_spark.operators.blocking import metablocking_pairs


def _blocked(spark, rows):
    return spark.createDataFrame(rows, "record_id int, block_key string")


def test_metablocking_hand_computed(spark):
    # r1,r2 share 2 blocks of their 2 each -> JS = 2/2 = 1.0
    # r1,r3 share 1 block; |B1|=2, |B3|=1 -> JS = 1/2
    # r2,r3 share 1 block -> JS = 1/2
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"),
    ]
    edges = {
        (r["id_a"], r["id_b"]): r
        for r in metablocking_pairs(_blocked(spark, rows)).collect()
    }
    # mean weight = (1e6 + 5e5 + 5e5)/3 = 666666.67 -> only (1,2) survives
    assert set(edges) == {(1, 2)}
    assert edges[(1, 2)]["common"] == 2
    assert edges[(1, 2)]["js_micro"] == 1_000_000


def test_metablocking_all_equal_weights_all_kept(spark):
    # every edge has the same weight -> mean == weight -> >= keeps all
    rows = [(1, "x"), (2, "x"), (3, "y"), (4, "y")]
    edges = metablocking_pairs(_blocked(spark, rows)).collect()
    assert {(r["id_a"], r["id_b"]) for r in edges} == {(1, 2), (3, 4)}


def test_metablocking_duplicate_assignments_collapse(spark):
    # the same (record, block) row twice must not double-count CBS
    rows = [(1, "x"), (1, "x"), (2, "x")]
    edges = metablocking_pairs(_blocked(spark, rows)).collect()
    assert len(edges) == 1 and edges[0]["common"] == 1


def test_metablocking_block_purging(spark):
    # block 'big' has 3 members > purge_above=2 -> contributes nothing;
    # r1-r2 still co-occur in 'small'
    rows = [
        (1, "big"), (2, "big"), (3, "big"),
        (1, "small"), (2, "small"),
    ]
    edges = metablocking_pairs(
        _blocked(spark, rows), purge_above=2
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in edges} == {(1, 2)}
    assert edges[0]["common"] == 1  # only the small block counts


def test_metablocking_plan_no_cartesian_and_broadcast_mean(spark):
    rows = [(i, f"b{i % 3}") for i in range(30)]
    plan = (
        metablocking_pairs(_blocked(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "EvalPython" not in plan
