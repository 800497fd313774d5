"""Edit-distance comparator battery + Monge-Elkan: pinned values,
plain-Python replays, and DuckDB-native cross-checks."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from fel_spark.functions.sim import jaro_winkler
from fel_spark.operators.editsim import edit_distance_scores, monge_elkan


def _pairs_df(spark, rows):
    return spark.createDataFrame(
        rows, "id_a long, id_b long, s_a string, s_b string"
    )


def test_edit_distance_scores_pinned(spark):
    df = _pairs_df(
        spark,
        [
            (1, 2, "kitten", "sitting"),
            (3, 4, "duck", "luck"),
            (5, 6, "martha", "marhta"),
            (7, 8, "abc", "abc"),
        ],
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in edit_distance_scores(df, hamming_width=8).collect()
    }
    # classic textbook values
    assert out[(1, 2)]["lev"] == 3
    assert out[(3, 4)]["lev"] == 1
    assert out[(7, 8)]["lev"] == 0
    # char-set jaccard: {d,u,c,k} vs {l,u,c,k} -> 3/5
    assert out[(3, 4)]["cjacc_micro"] == 600000
    assert out[(7, 8)]["cjacc_micro"] == 1000000
    # JW('martha','marhta') = 0.9611...
    assert out[(5, 6)]["jw_micro"] == round(
        jaro_winkler("martha", "marhta") * 1_000_000
    )
    # hamming over lpad-8: '00kitten' vs '0sitting' -> positionwise
    a, b = "00kitten", "0sitting"
    assert out[(1, 2)]["ham"] == sum(x != y for x, y in zip(a, b))
    assert out[(7, 8)]["ham"] == 0


def test_edit_distance_scores_matches_duckdb_native(spark):
    """Every comparator agrees with DuckDB's native implementation on a
    word grid (lev/hamming/jaccard are two independent engine-native
    implementations; JW is the fuzz-proven kernel)."""
    words = [
        "spark", "spork", "sparkle", "park", "shark",
        "a", "ab", "abcdefgh", "hhhhhhhh", "zzz",
    ]
    rows = [
        (i, j, words[i], words[j])
        for i in range(len(words))
        for j in range(len(words))
        if i < j
    ]
    out = edit_distance_scores(
        _pairs_df(spark, rows), hamming_width=8
    ).collect()
    con = duckdb.connect()
    for r in out:
        lev, ham, jw, cj = con.sql(
            "SELECT levenshtein(?, ?), hamming(lpad(?, 8, '0'), lpad(?, 8, '0')),"
            " CAST(round(jaro_winkler_similarity(?, ?) * 1000000) AS BIGINT),"
            " CAST(round(jaccard(?, ?) * 1000000) AS BIGINT)",
            params=[r["s_a"], r["s_b"]] * 4,
        ).fetchone()
        assert (r["lev"], r["ham"], r["jw_micro"], r["cjacc_micro"]) == (
            lev,
            ham,
            jw,
            cj,
        ), (r["s_a"], r["s_b"])


def test_monge_elkan_python_replay(spark):
    """me_micro equals a plain-Python replay of the published definition
    (mean over A-tokens of the best JW among B-tokens), including the
    duplicate-A-token case the per-position grouping exists for."""
    rows = [
        (1, 2, ["peter", "christen"], ["christen", "pedro"]),
        (3, 4, ["a", "a", "b"], ["a"]),  # duplicate A tokens both count
        (5, 6, ["solo"], ["solo"]),
    ]
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, toks_a array<string>, toks_b array<string>"
    )
    out = {
        (r["id_a"], r["id_b"]): r["me_micro"]
        for r in monge_elkan(df).collect()
    }

    def me(ta, tb):
        best = [
            max(round(jaro_winkler(x, y) * 1_000_000) for y in tb) for x in ta
        ]
        return round(sum(best) / len(best))

    for ia, ib, ta, tb in rows:
        assert out[(ia, ib)] == me(ta, tb), (ta, tb)


def test_edit_scores_plan_is_map_only_past_join(spark):
    """The comparator battery adds no shuffle beyond the blocked join:
    exactly the join's Exchanges appear, and the only Python evaluation
    is the one Arrow-batched JW stage."""
    df = _pairs_df(spark, [(1, 2, "ab", "ba")])
    plan = (
        edit_distance_scores(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # no join here: pure map
    assert plan.count("ArrowEvalPython") == 1


# ---------------------------------------------------------------------------
# plain Jaro (boost-free kernel path)


def test_jaro_batch_matches_duckdb_native_fuzz():
    """The kernel with the Winkler step disabled is bit-exact against
    DuckDB's native jaro_similarity on random non-empty strings (empty
    input is excluded by contract: the engines define jaro('','')
    differently)."""
    import random

    from fel_spark.functions.sim import jaro, jaro_winkler_batch

    rng = random.Random(99)

    def rs(maxlen):
        return "".join(
            rng.choice("abcdefgh") for _ in range(rng.randint(1, maxlen))
        )

    a = [rs(12) for _ in range(800)]
    b = [rs(12) for _ in range(800)]
    got = jaro_winkler_batch(a, b, winkler=False)
    con = duckdb.connect()
    for x, y, g in zip(a, b, got):
        (exp,) = con.sql(
            "SELECT jaro_similarity(?, ?)", params=[x, y]
        ).fetchone()
        assert g == exp, (x, y)
        assert jaro(x, y) == exp, (x, y)
    # classic textbook value (Winkler 1990, table 1)
    assert round(jaro("martha", "marhta"), 12) == round(17 / 18, 12)


# ---------------------------------------------------------------------------
# TF-IDF cosine + SoftTFIDF: plain-Python replays of the exact-int chain


def _py_norm_tokens(text):
    import re

    return re.sub(r"[^a-z0-9]+", " ", text.lower()).split()


def _py_tfidf_weights(texts):
    """Replay of editsim._tfidf_weights: w4 = round(tf*idf*1e4) per
    (record, word); norm2 = exact-int sum of squares."""
    import math
    from collections import Counter

    tf = {i: Counter(_py_norm_tokens(t)) for i, t in texts.items()}
    n_docs = len(texts)
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    w4 = {
        i: {
            w: int(
                round(
                    (c * (math.log((n_docs + 1.0) / (df[w] + 1.0)) + 1.0))
                    * 10000.0
                )
            )
            for w, c in cc.items()
        }
        for i, cc in tf.items()
    }
    norm2 = {i: sum(v * v for v in ws.values()) for i, ws in w4.items()}
    return w4, norm2


def test_tfidf_cosine_pairs_replay(spark):
    import math

    from fel_spark.operators.editsim import tfidf_cosine_pairs

    texts = {
        1: "alpha beta gamma",
        2: "alpha beta delta delta",
        3: "zeta eta theta",
        4: "alpha beta gamma",
    }
    pair_ids = [(1, 2), (1, 3), (1, 4), (2, 3)]
    records = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "rec_id long, text string"
    )
    pairs = spark.createDataFrame(pair_ids, "id_a long, id_b long")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in tfidf_cosine_pairs(records, pairs).collect()
    }
    w4, norm2 = _py_tfidf_weights(texts)
    for ia, ib in pair_ids:
        shared = set(w4[ia]) & set(w4[ib])
        dot = sum(w4[ia][w] * w4[ib][w] for w in shared)
        cos = (
            dot / (math.sqrt(norm2[ia]) * math.sqrt(norm2[ib]))
            if norm2[ia] and norm2[ib]
            else 0.0
        )
        r = out[(ia, ib)]
        assert r["n_shared"] == len(shared)
        assert r["dot"] == dot
        assert r["cos_micro"] == round(cos * 1_000_000)
    # identical records -> cosine exactly 1; disjoint -> all zeros
    assert out[(1, 4)]["cos_micro"] == 1_000_000
    assert (out[(1, 3)]["n_shared"], out[(1, 3)]["dot"]) == (0, 0)
    assert out[(1, 3)]["cos_micro"] == 0


def test_soft_tfidf_replay(spark):
    import math

    from fel_spark.operators.editsim import soft_tfidf

    texts = {
        1: "jon smith",
        2: "john smith",
        3: "peter jones",
        4: "jon smyth",
        5: "quincy adams",
    }
    pair_ids = [(1, 2), (1, 3), (1, 4), (2, 4), (1, 5)]
    records = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "rec_id long, text string"
    )
    pairs = spark.createDataFrame(pair_ids, "id_a long, id_b long")
    out = {
        (r["id_a"], r["id_b"]): r["st_pico"]
        for r in soft_tfidf(records, pairs, theta=0.9).collect()
    }
    w4, norm2 = _py_tfidf_weights(texts)
    unit = {
        i: {
            w: int(round(1000.0 * v / math.sqrt(norm2[i])))
            for w, v in ws.items()
        }
        for i, ws in w4.items()
    }
    for ia, ib in pair_ids:
        st = 0
        for ta, va in unit[ia].items():
            cands = []
            for tb, vb in unit[ib].items():
                jm = round(jaro_winkler(ta, tb) * 1_000_000)
                if jm >= 900_000:
                    # argmax: jw DESC then token ASC
                    cands.append((-jm, tb, vb, jm))
            if cands:
                _, _, vb, jm = min(cands)
                st += va * vb * jm
        assert out[(ia, ib)] == st, (ia, ib)
    # a totally-unrelated pair contributes nothing but is still emitted
    assert out[(1, 5)] == 0


# ---------------------------------------------------------------------------
# LCS


def _py_lcs(a, b):
    la, lb = len(a), len(b)
    dp = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la):
        for j in range(lb):
            dp[i + 1][j + 1] = (
                dp[i][j] + 1 if a[i] == b[j] else max(dp[i][j + 1], dp[i + 1][j])
            )
    return dp[la][lb]


def test_lcs_batch_matches_wagner_fischer_fuzz():
    import random

    from fel_spark.functions.sim import lcs_batch

    rng = random.Random(107)
    pairs = [("", ""), ("a", ""), ("", "b"), ("abc", "cba")]
    for _ in range(400):
        pairs.append(
            (
                "".join(rng.choice("abcd") for _ in range(rng.randint(0, 11))),
                "".join(rng.choice("abcd") for _ in range(rng.randint(0, 11))),
            )
        )
    got = lcs_batch([p[0] for p in pairs], [p[1] for p in pairs])
    for (a, b), g in zip(pairs, got):
        assert g == _py_lcs(a, b), (a, b)


def test_lcs_scores_normalization(spark):
    from fel_spark.operators.editsim import lcs_scores

    rows = [(1, 2, "banana", "bandana"), (3, 4, "", ""), (5, 6, "ab", "cd")]
    df = spark.createDataFrame(rows, "id_a long, id_b long, s_a string, s_b string")
    got = {
        (r["id_a"], r["id_b"]): (r["lcs"], r["lcs_sim_micro"])
        for r in lcs_scores(df, "s_a", "s_b").collect()
    }
    assert got[(1, 2)] == (6, (2 * 6 * 1_000_000) // 13)
    assert got[(3, 4)] == (0, 1_000_000)
    assert got[(5, 6)] == (0, 0)


# ---------------------------------------------------------------------------
# Smith-Waterman


def _py_sw(a, b, m=2, mm=-1, g=1):
    la, lb = len(a), len(b)
    h = [[0] * (lb + 1) for _ in range(la + 1)]
    best = 0
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            s = m if a[i - 1] == b[j - 1] else mm
            h[i][j] = max(
                0, h[i - 1][j - 1] + s, h[i - 1][j] - g, h[i][j - 1] - g
            )
            best = max(best, h[i][j])
    return best


def test_smith_waterman_batch_matches_scalar_fuzz():
    import random

    from fel_spark.functions.sim import smith_waterman_batch

    rng = random.Random(109)
    pairs = [("", ""), ("a", ""), ("gattaca", "attac"), ("xxabcxx", "yyabcyy")]
    for _ in range(400):
        pairs.append(
            (
                "".join(rng.choice("abcd") for _ in range(rng.randint(0, 11))),
                "".join(rng.choice("abcd") for _ in range(rng.randint(0, 11))),
            )
        )
    got = smith_waterman_batch([p[0] for p in pairs], [p[1] for p in pairs])
    for (a, b), g in zip(pairs, got):
        assert g == _py_sw(a, b), (a, b)


def test_smith_waterman_scores_containment(spark):
    from fel_spark.operators.editsim import smith_waterman_scores

    # "abc" inside junk scores a perfect local alignment: sw = 2*3,
    # sim = 1.0 against the shorter side
    rows = [(1, 2, "xxabcxx", "abc"), (3, 4, "", "abc"), (5, 6, "ab", "cd")]
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, s_a string, s_b string"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["sw"], r["sw_sim_micro"])
        for r in smith_waterman_scores(df, "s_a", "s_b").collect()
    }
    assert got[(1, 2)] == (6, 1_000_000)
    assert got[(3, 4)] == (0, 0)
    assert got[(5, 6)] == (0, 0)


def _py_nw(a, b, m=2, mm=-1, g=1):
    la, lb = len(a), len(b)
    h = [[0] * (lb + 1) for _ in range(la + 1)]
    for j in range(lb + 1):
        h[0][j] = -g * j
    for i in range(1, la + 1):
        h[i][0] = -g * i
        for j in range(1, lb + 1):
            s = m if a[i - 1] == b[j - 1] else mm
            h[i][j] = max(
                h[i - 1][j - 1] + s, h[i - 1][j] - g, h[i][j - 1] - g
            )
    return h[la][lb]


def test_needleman_wunsch_batch_matches_scalar_fuzz():
    import random

    from fel_spark.functions.sim import needleman_wunsch_batch

    rng = random.Random(131)
    pairs = [("", ""), ("a", ""), ("", "bc"), ("same", "same")]
    for _ in range(400):
        pairs.append(
            (
                "".join(rng.choice("abcd") for _ in range(rng.randint(0, 11))),
                "".join(rng.choice("abcd") for _ in range(rng.randint(0, 11))),
            )
        )
    got = needleman_wunsch_batch([p[0] for p in pairs], [p[1] for p in pairs])
    for (a, b), g in zip(pairs, got):
        assert g == _py_nw(a, b), (a, b)


def test_nw_punishes_junk_sw_ignores(spark):
    from fel_spark.operators.editsim import (
        needleman_wunsch_scores,
        smith_waterman_scores,
    )

    rows = [(1, 2, "xxabcxx", "abc")]
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, s_a string, s_b string"
    )
    sw = smith_waterman_scores(df, "s_a", "s_b").collect()[0]
    nw = needleman_wunsch_scores(df, "s_a", "s_b").collect()[0]
    assert sw["sw_sim_micro"] == 1_000_000  # perfect containment
    assert nw["nw"] == 2 * 3 - 4  # 3 matches, 4 gaps
    assert nw["nw_sim_micro"] < sw["sw_sim_micro"]


# ---------------------------------------------------------------------------
# token-sort / token-set ratios


def _py_lev(a, b):
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = min(
                dp[j] + 1,
                dp[j - 1] + 1,
                prev + (a[i - 1] != b[j - 1]),
            )
            prev, dp[j] = dp[j], cur
    return dp[lb]


def _py_lev_sim(a, b):
    mx = max(len(a), len(b))
    return 1_000_000 if mx == 0 else round((1.0 - _py_lev(a, b) / mx) * 1e6)


def _py_token_sort(a, b):
    sa = " ".join(sorted(set(t for t in a.lower().split(" ") if t)))
    sb = " ".join(sorted(set(t for t in b.lower().split(" ") if t)))
    return _py_lev_sim(sa, sb)


def _py_token_set(a, b):
    ta = set(t for t in a.lower().split(" ") if t)
    tb = set(t for t in b.lower().split(" ") if t)
    t0 = " ".join(sorted(ta & tb))
    t1 = " ".join(sorted(ta & tb) + sorted(ta - tb))
    t2 = " ".join(sorted(ta & tb) + sorted(tb - ta))
    return max(
        _py_lev_sim(t0, t1), _py_lev_sim(t0, t2), _py_lev_sim(t1, t2)
    )


def test_token_ratios_replay_fuzz(spark):
    import random

    from fel_spark.operators.editsim import token_set_scores, token_sort_scores

    rng = random.Random(137)
    words = ["jonathan", "meyer", "dr", "phd", "van", "der", "berg", "j"]
    rows = []
    for i in range(40):
        na = " ".join(rng.choice(words) for _ in range(rng.randint(0, 4)))
        nb = " ".join(rng.choice(words) for _ in range(rng.randint(0, 4)))
        rows.append((i, i + 1000, na, nb))
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, s_a string, s_b string"
    )
    srt = {
        r["id_a"]: r["token_sort_sim_micro"]
        for r in token_sort_scores(df, "s_a", "s_b").collect()
    }
    st = {
        r["id_a"]: r["token_set_sim_micro"]
        for r in token_set_scores(df, "s_a", "s_b").collect()
    }
    for i, _, na, nb in rows:
        assert srt[i] == _py_token_sort(na, nb), (na, nb)
        assert st[i] == _py_token_set(na, nb), (na, nb)


def test_token_ratios_canonical_cases(spark):
    from fel_spark.operators.editsim import token_set_scores, token_sort_scores

    rows = [
        (1, 2, "meyer, jonathan".replace(",", ""), "jonathan meyer"),
        (3, 4, "jonathan meyer", "dr jonathan meyer phd"),
    ]
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, s_a string, s_b string"
    )
    srt = {
        r["id_a"]: r["token_sort_sim_micro"]
        for r in token_sort_scores(df, "s_a", "s_b").collect()
    }
    st = {
        r["id_a"]: r["token_set_sim_micro"]
        for r in token_set_scores(df, "s_a", "s_b").collect()
    }
    assert srt[1] == 1_000_000  # word order vanishes under token sort
    assert st[3] == 1_000_000  # subset listing is perfect under token set
    assert srt[3] < 1_000_000  # ...but not under token sort
