from __future__ import annotations

from fel_spark.operators.progressive import progressive_snm_curve


def test_progressive_curve_hand_case(spark):
    # sort key = the id itself (zero-padded): ranks are 1..6 in id order
    df = spark.createDataFrame(
        [(i, f"{i:03d}") for i in range(1, 7)], ["record_id", "k"]
    )
    # matches: (1,2) adjacent -> wave 1; (3,5) -> wave 2; (1,6) outside w=4
    labeled = spark.createDataFrame(
        [(1, 2), (5, 3), (1, 6)], ["id_a", "id_b"]
    )
    rows = {
        r["wave"]: r
        for r in progressive_snm_curve(
            df, "k", labeled, window=4, prefix_len=1
        ).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert (rows[1]["n_pairs"], rows[1]["n_matches"]) == (5, 1)
    assert (rows[2]["n_pairs"], rows[2]["n_matches"]) == (4, 1)
    assert (rows[3]["n_pairs"], rows[3]["n_matches"]) == (3, 0)
    assert rows[3]["cum_pairs"] == 12 and rows[3]["cum_matches"] == 2
    # early quality decays as waves widen; recall vs ALL 3 labels
    assert rows[1]["early_quality_4dp"] == 10000 * 1 // 5
    assert rows[3]["early_quality_4dp"] == 10000 * 2 // 12
    assert rows[1]["recall_4dp"] == 10000 // 3
    assert rows[3]["recall_4dp"] == 2 * 10000 // 3


def test_progressive_curve_no_labels(spark):
    df = spark.createDataFrame(
        [(i, f"{i:03d}") for i in range(1, 5)], ["record_id", "k"]
    )
    labeled = spark.createDataFrame([], "id_a long, id_b long")
    rows = progressive_snm_curve(df, "k", labeled, window=3).collect()
    assert all(r["n_matches"] == 0 and r["recall_4dp"] == 0 for r in rows)
