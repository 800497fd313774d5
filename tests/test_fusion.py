"""Survivorship (golden records) and blocking-quality metrics."""

from __future__ import annotations

from fel_spark.operators.blocking import blocking_quality
from fel_spark.operators.fusion import golden_records


def test_golden_records_majority_tie_and_null(spark):
    rows = [
        # cluster 1: lang majority en (2 vs 1); source tie a/b -> 'a'
        (1, "en", "a"),
        (1, "en", "b"),
        (1, "fr", None),
        # cluster 2: all-null lang -> NULL canonical; source single
        (2, None, "z"),
        (2, None, "z"),
    ]
    df = spark.createDataFrame(
        rows, "cluster_id int, lang string, source string"
    )
    out = {
        r["cluster_id"]: r
        for r in golden_records(df, "cluster_id", ["lang", "source"]).collect()
    }
    assert out[1]["n_members"] == 3
    assert out[1]["lang"] == "en" and out[1]["lang_support"] == 2
    # tie between 'a' (1 vote) and 'b' (1 vote) -> smallest value wins
    assert out[1]["source"] == "a" and out[1]["source_support"] == 1
    assert out[2]["lang"] is None and out[2]["lang_support"] is None
    assert out[2]["source"] == "z" and out[2]["source_support"] == 2


def test_golden_records_defaults_to_all_non_cluster_columns(spark):
    df = spark.createDataFrame(
        [(1, "x", 5), (1, "x", 7), (1, "y", 7)],
        "cluster_id int, a string, b int",
    )
    r = golden_records(df).collect()[0]
    # b is cast to string in the long-form melt
    assert r["a"] == "x" and r["b"] == "7"
    assert r["a_support"] == 2 and r["b_support"] == 2


def test_blocking_quality_hand_computed(spark):
    # 6 records, gold clusters {1,2,3} and {4,5,6}
    gold = spark.createDataFrame(
        [(i, 0 if i <= 3 else 1) for i in range(1, 7)],
        "record_id int, gold int",
    )
    # block k1={1,2,3,4}; block k2={1,2} (pair 1-2 co-blocked twice:
    # the distinct-pair dedup must count it once); record 5,6 unblocked
    # except singleton blocks (contribute no pairs)
    blocked = spark.createDataFrame(
        [(1, "k1"), (2, "k1"), (3, "k1"), (4, "k1"),
         (1, "k2"), (2, "k2"), (5, "s5"), (6, "s6")],
        "record_id int, block_key string",
    )
    r = blocking_quality(blocked, gold).collect()[0]
    assert r["n_records"] == 6
    assert r["n_blocks"] == 4
    # pairs within k1: C(4,2)=6; k2 adds none new
    assert r["n_candidate_pairs"] == 6
    # gold pairs: C(3,2)*2 = 6
    assert r["n_gold_pairs"] == 6
    # covered gold pairs: within k1 & same gold: (1,2),(1,3),(2,3) = 3
    assert r["n_covered_gold_pairs"] == 3
    # C(6,2)=15 total -> rr = 1 - 6/15 = 0.6
    assert r["reduction_ratio_micro"] == 600000
    assert r["pairs_completeness_micro"] == 500000
    assert r["pairs_quality_micro"] == 500000


def test_blocking_quality_perfect_blocking(spark):
    # blocking key == gold cluster: completeness 1, quality 1
    gold = spark.createDataFrame(
        [(i, i % 2) for i in range(8)], "record_id int, gold int"
    )
    blocked = gold.selectExpr(
        "record_id", "cast(gold as string) as block_key"
    )
    r = blocking_quality(blocked, gold).collect()[0]
    assert r["pairs_completeness_micro"] == 1000000
    assert r["pairs_quality_micro"] == 1000000
    # 12 candidate / 28 total
    assert r["n_candidate_pairs"] == 12 and r["reduction_ratio_micro"] == round(
        (1 - 12 / 28) * 1e6
    )
