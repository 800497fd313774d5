"""Blocking-rule coverage: hand-computed marginals, order sensitivity,
degenerate gold."""

from __future__ import annotations

from fel_spark.operators.blocking import blocking_rule_coverage


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long, rule string")


def _gold(spark, rows):
    return spark.createDataFrame(rows, "record_id long, gold long")


GOLD = [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 2)]
# true pairs: (1,2),(1,3),(2,3),(4,5) -> total_true = 4
PAIRS = [
    (1, 2, "ra"),  # true, first covered by ra
    (1, 3, "ra"),  # true
    (1, 2, "rb"),  # duplicate coverage of (1,2)
    (2, 3, "rb"),  # true, only rb
    (4, 6, "rb"),  # false pair
    (5, 6, "rc"),  # false pair
]


def test_blocking_rule_coverage_hand_computed(spark):
    out = {
        r["rule"]: r
        for r in blocking_rule_coverage(
            _pairs(spark, PAIRS), _gold(spark, GOLD), ["ra", "rb", "rc"]
        ).collect()
    }
    ra, rb, rc = out["ra"], out["rb"], out["rc"]
    assert (ra["n_pairs"], ra["n_true_pairs"], ra["marginal_true_pairs"]) == (
        2, 2, 2,
    )
    # rb covers 3 pairs; (1,2) is true but ra saw it first
    assert (rb["n_pairs"], rb["n_true_pairs"], rb["marginal_true_pairs"]) == (
        3, 2, 1,
    )
    assert (rc["n_pairs"], rc["n_true_pairs"], rc["marginal_true_pairs"]) == (
        1, 0, 0,
    )
    assert ra["recall_micro"] == 500_000  # 2/4
    assert ra["cum_recall_micro"] == 500_000
    assert rb["cum_recall_micro"] == 750_000  # (2+1)/4
    assert rc["cum_recall_micro"] == 750_000  # (1,3)? no: (4,5) never found


def test_blocking_rule_order_moves_marginals_not_totals(spark):
    flipped = {
        r["rule"]: r
        for r in blocking_rule_coverage(
            _pairs(spark, PAIRS), _gold(spark, GOLD), ["rb", "ra", "rc"]
        ).collect()
    }
    # per-rule recall is order-invariant; marginals shift to rb
    assert flipped["rb"]["n_true_pairs"] == 2
    assert flipped["rb"]["marginal_true_pairs"] == 2  # now sees (1,2) first
    assert flipped["ra"]["marginal_true_pairs"] == 1  # only (1,3)
    assert flipped["rc"]["cum_recall_micro"] == 750_000  # union unchanged


def test_blocking_rule_coverage_all_singleton_gold(spark):
    out = blocking_rule_coverage(
        _pairs(spark, [(1, 2, "ra")]),
        _gold(spark, [(1, 0), (2, 1)]),
        ["ra"],
    ).collect()
    assert out[0]["recall_micro"] == 0 and out[0]["cum_recall_micro"] == 0
