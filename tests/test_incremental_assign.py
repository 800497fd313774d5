"""Incremental cluster attachment: hand cases + tie-break determinism."""

from __future__ import annotations

from fel_spark.operators.linkage import incremental_assign


def _df(spark, rows, with_cluster):
    schema = "record_id long, key string, bk int" + (
        ", cluster_id long" if with_cluster else ""
    )
    return spark.createDataFrame(rows, schema)


def test_incremental_assign_attach_below_threshold_and_unblocked(spark):
    new = _df(
        spark,
        [
            (100, "jonathan", 1),  # near-exact -> attaches
            (101, "zzzzzz", 1),  # poor match -> is_new
            (102, "anything", 9),  # empty block -> is_new, NULL score
        ],
        with_cluster=False,
    )
    old = _df(
        spark,
        [(1, "jonathon", 1, 7), (2, "abcdef", 1, 8)],
        with_cluster=True,
    )
    out = {
        r["record_id"]: r
        for r in incremental_assign(new, old, threshold_micro=900_000).collect()
    }
    assert out[100]["cluster_id"] == 7 and out[100]["matched_id"] == 1
    assert out[100]["is_new"] is False
    assert out[101]["cluster_id"] is None and out[101]["is_new"] is True
    assert out[101]["best_jw_micro"] is not None  # scored, just below
    assert out[102]["best_jw_micro"] is None and out[102]["is_new"] is True


def test_incremental_assign_tie_break_is_neutral(spark):
    # two existing members with IDENTICAL keys -> equal scores; the
    # (cluster ASC, member ASC) tie-break must pick cluster 3, member 5
    new = _df(spark, [(200, "same", 1)], with_cluster=False)
    old = _df(
        spark,
        [(9, "same", 1, 4), (5, "same", 1, 3), (6, "same", 1, 3)],
        with_cluster=True,
    )
    r = incremental_assign(new, old, threshold_micro=1_000_000).collect()[0]
    assert r["cluster_id"] == 3 and r["matched_id"] == 5
    assert r["best_jw_micro"] == 1_000_000 and r["is_new"] is False


def test_incremental_assign_every_new_record_surfaces(spark):
    new = _df(
        spark, [(i, f"k{i}", i % 3) for i in range(20)], with_cluster=False
    )
    old = _df(spark, [(900, "k1", 1, 1)], with_cluster=True)
    out = incremental_assign(new, old).collect()
    assert len(out) == 20  # left join: nothing silently dropped
