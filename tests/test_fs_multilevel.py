"""Multi-level Fellegi-Sunter: plain-Python replay, unseen-level
smoothing, simplex property, end-to-end scoring."""

from __future__ import annotations

import math

from fel_spark.operators.linkage import (
    fs_score_multilevel,
    fs_weights_multilevel,
)

LEVELS = {"len_level": 3, "lang_level": 2}


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "id_a long, id_b long, len_level long, lang_level long, "
        "is_match long"
    )


ROWS = [
    (1, 2, 2, 1, 1),
    (1, 3, 2, 1, 1),
    (2, 3, 1, 1, 1),
    (1, 4, 0, 0, 0),
    (2, 4, 1, 0, 0),
    (3, 4, 0, 1, 0),
    (1, 5, 0, 0, 0),
]


def _ref_weights():
    tm = sum(r[4] for r in ROWS)
    tu = len(ROWS) - tm
    out = {}
    for fi, (feat, nl) in enumerate([("len_level", 3), ("lang_level", 2)]):
        for lv in range(nl):
            cm = sum(1 for r in ROWS if r[2 + fi] == lv and r[4] == 1)
            cu = sum(1 for r in ROWS if r[2 + fi] == lv and r[4] == 0)
            m = (cm + 0.5) / (tm + 0.5 * nl)
            u = (cu + 0.5) / (tu + 0.5 * nl)
            out[(feat, lv)] = (cm, cu, m, u, math.log2(m / u))
    return out


def test_multilevel_weights_python_replay(spark):
    got = {
        (r["feature"], r["level"]): r
        for r in fs_weights_multilevel(_pairs(spark, ROWS), LEVELS).collect()
    }
    ref = _ref_weights()
    assert set(got) == set(ref)  # full declared grid, unseen included
    for key, (cm, cu, m, u, w) in ref.items():
        r = got[key]
        assert (r["n_match"], r["n_nonmatch"]) == (cm, cu), key
        assert r["m_micro"] == round(m * 1e6), key
        assert r["u_micro"] == round(u * 1e6), key
        assert r["w_micro"] == round(w * 1e6), key


def test_multilevel_unseen_level_finite(spark):
    # no pair has len_level == 2 here -> smoothed, finite weight row
    rows = [(1, 2, 0, 1, 1), (1, 3, 1, 0, 0)]
    got = {
        (r["feature"], r["level"]): r
        for r in fs_weights_multilevel(_pairs(spark, rows), LEVELS).collect()
    }
    r = got[("len_level", 2)]
    assert r["n_match"] == 0 and r["n_nonmatch"] == 0
    assert r["m_micro"] > 0 and r["u_micro"] > 0
    assert abs(r["w_micro"]) < 10_000_000  # finite, sane magnitude


def test_multilevel_m_simplex_sums_to_one(spark):
    w = fs_weights_multilevel(_pairs(spark, ROWS), LEVELS).collect()
    for feat in LEVELS:
        s = sum(r["m_micro"] for r in w if r["feature"] == feat)
        assert abs(s - 1_000_000) <= 2  # micro rounding slack per level


def test_multilevel_score_is_sum_of_selected_weights(spark):
    df = _pairs(spark, ROWS)
    w = fs_weights_multilevel(df, LEVELS)
    wmap = {
        (r["feature"], r["level"]): r["w_micro"] for r in w.collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["fs_score_micro"]
        for r in fs_score_multilevel(
            df.drop("is_match"), w, list(LEVELS)
        ).collect()
    }
    for ia, ib, lv_len, lv_lang, _ in ROWS:
        want = wmap[("len_level", lv_len)] + wmap[("lang_level", lv_lang)]
        assert got[(ia, ib)] == want
    # matches score above non-matches on this separable toy data
    m_scores = [got[(r[0], r[1])] for r in ROWS if r[4] == 1]
    u_scores = [got[(r[0], r[1])] for r in ROWS if r[4] == 0]
    assert min(m_scores) > max(u_scores)
