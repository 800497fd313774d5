from __future__ import annotations

from pyspark.sql import functions as F

from fel_spark.operators.grouplink import group_linkage


def _sizes(spark, d):
    return spark.createDataFrame(list(d.items()), ["group", "n"])


def test_group_linkage_hand_case(spark):
    pairs = spark.createDataFrame(
        [
            ("A", "B", "a1", "b1", 10000),
            ("A", "B", "a1", "b2", 9500),
            ("A", "B", "a2", "b2", 9200),
            ("A", "B", "a2", "b3", 500),  # below min_sim: never aligned
        ],
        ["ga", "gb", "ma", "mb", "sim_4dp"],
    )
    sizes = _sizes(spark, {"A": 2, "B": 3})
    row = group_linkage(pairs, sizes).collect()[0]
    # greedy: (a1,b1,10000) then (a2,b2,9200); a1-b2 blocked by a1
    assert (row["n_a"], row["n_b"], row["n_matched"]) == (2, 3, 2)
    assert row["sum_sim_4dp"] == 19200
    assert row["bms_4dp"] == 19200 // 3  # |A|+|B|-m = 3


def test_group_linkage_identical_groups_score_1(spark):
    pairs = spark.createDataFrame(
        [("A", "B", "x1", "y1", 10000), ("A", "B", "x2", "y2", 10000)],
        ["ga", "gb", "ma", "mb", "sim_4dp"],
    )
    row = group_linkage(pairs, _sizes(spark, {"A": 2, "B": 2})).collect()[0]
    assert (row["n_matched"], row["bms_4dp"]) == (2, 10000)


def test_group_linkage_no_strong_edges_scores_0(spark):
    pairs = spark.createDataFrame(
        [("A", "B", "a1", "b1", 100)], ["ga", "gb", "ma", "mb", "sim_4dp"]
    )
    row = group_linkage(pairs, _sizes(spark, {"A": 1, "B": 1})).collect()[0]
    assert (row["n_matched"], row["sum_sim_4dp"], row["bms_4dp"]) == (0, 0, 0)


def test_group_linkage_alignment_independent_per_group_pair(spark):
    # member a1 belongs to group A; A is a candidate against B and C —
    # a1 must be allowed to match in BOTH group pairs.
    pairs = spark.createDataFrame(
        [
            ("A", "B", "a1", "b1", 10000),
            ("A", "C", "a1", "c1", 9800),
        ],
        ["ga", "gb", "ma", "mb", "sim_4dp"],
    )
    rows = {
        (r["ga"], r["gb"]): r
        for r in group_linkage(
            pairs, _sizes(spark, {"A": 1, "B": 1, "C": 1})
        ).collect()
    }
    assert rows[("A", "B")]["n_matched"] == 1
    assert rows[("A", "C")]["n_matched"] == 1
    assert rows[("A", "B")]["bms_4dp"] == 10000
    assert rows[("A", "C")]["bms_4dp"] == 9800
