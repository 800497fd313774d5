"""V-measure and threshold PR-curve: plain-Python replays + edge cases."""

from __future__ import annotations

import math

from fel_spark.operators.evalmetrics import threshold_curve, vmeasure


def _assign(spark, rows):
    return spark.createDataFrame(rows, "pred long, gold long")


def _v_ref(rows):
    """Plain-Python Rosenberg-Hirschberg replay."""
    n = len(rows)
    from collections import Counter

    cells = Counter(rows)
    pn = Counter(p for p, _ in rows)
    gn = Counter(g for _, g in rows)

    def ent(counts):
        return math.log(n) - sum(c * math.log(c) for c in counts.values()) / n

    h_gold, h_pred = ent(gn), ent(pn)
    h_gp = -sum(c * math.log(c / pn[p]) for (p, g), c in cells.items()) / n
    h_pg = -sum(c * math.log(c / gn[g]) for (p, g), c in cells.items()) / n
    h = 1.0 if h_gold == 0 else 1.0 - h_gp / h_gold
    c = 1.0 if h_pred == 0 else 1.0 - h_pg / h_pred
    v = 0.0 if h + c == 0 else 2.0 * h * c / (h + c)
    return round(h * 1e6), round(c * 1e6), round(v * 1e6)


def test_vmeasure_perfect(spark):
    rows = [(i % 3, i % 3) for i in range(30)]
    r = vmeasure(_assign(spark, rows)).collect()[0]
    assert (
        r["homogeneity_micro"],
        r["completeness_micro"],
        r["vmeasure_micro"],
    ) == (1_000_000, 1_000_000, 1_000_000)


def test_vmeasure_single_pred_cluster_is_complete_not_homogeneous(spark):
    rows = [(0, i % 2) for i in range(10)]
    r = vmeasure(_assign(spark, rows)).collect()[0]
    assert r["completeness_micro"] == 1_000_000
    assert r["homogeneity_micro"] == 0  # H(gold|pred) == H(gold)
    assert r["vmeasure_micro"] == 0


def test_vmeasure_python_replay(spark):
    rows = [
        (i % 4 if i % 7 else 99, (i * 3) % 5) for i in range(200)
    ]
    r = vmeasure(_assign(spark, rows)).collect()[0]
    h, c, v = _v_ref(rows)
    assert (
        r["homogeneity_micro"],
        r["completeness_micro"],
        r["vmeasure_micro"],
    ) == (h, c, v)
    assert r["n_records"] == 200


def test_threshold_curve_pinned(spark):
    df = spark.createDataFrame(
        [(5, True), (5, False), (3, False), (1, True), (0, False)],
        "score int, is_match boolean",
    )
    rows = {
        r["thr"]: r for r in threshold_curve(df, "score").collect()
    }
    assert rows[5]["tp"] == 1 and rows[5]["fp"] == 1 and rows[5]["fn"] == 1
    assert rows[5]["prec_micro"] == 500_000
    assert rows[5]["rec_micro"] == 500_000
    assert rows[5]["f1_micro"] == 500_000
    assert rows[1]["tp"] == 2 and rows[1]["fn"] == 0
    assert rows[1]["rec_micro"] == 1_000_000
    assert rows[0]["prec_micro"] == 400_000
    # monotone recall as threshold drops
    recs = [rows[t]["rec_micro"] for t in sorted(rows, reverse=True)]
    assert recs == sorted(recs)


def test_threshold_curve_zero_matches_degenerate(spark):
    df = spark.createDataFrame(
        [(9, False), (5, False)], "score int, is_match boolean"
    )
    out = threshold_curve(df, "score").collect()
    assert all(
        r["tp"] == 0 and r["rec_micro"] == 0 and r["f1_micro"] == 0
        for r in out
    )


def test_threshold_curve_leading_tp_zero(spark):
    # highest-score pair is a non-match: precision/recall/f1 all 0, no crash
    df = spark.createDataFrame(
        [(9, False), (5, True)], "score int, is_match boolean"
    )
    rows = {r["thr"]: r for r in threshold_curve(df, "score").collect()}
    assert rows[9]["f1_micro"] == 0 and rows[9]["prec_micro"] == 0
    assert rows[5]["f1_micro"] == round(2 / 3 * 1e6)
