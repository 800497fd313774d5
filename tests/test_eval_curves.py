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


# ---------------------------------------------------------------------------
# MUC


def _py_muc(pairs):
    """Plain MUC (Vilain et al. 1995) over (pred, gold) assignments."""
    from collections import defaultdict

    gold, pred = defaultdict(list), defaultdict(list)
    for i, (p, g) in enumerate(pairs):
        gold[g].append(i)
        pred[p].append(i)

    def side(clusters, other):
        num = den = 0
        for members in clusters.values():
            parts = {other[m] for m in members}
            num += len(members) - len(parts)
            den += len(members) - 1
        return num / den if den else 0.0

    gold_of = {i: g for i, (p, g) in enumerate(pairs)}
    pred_of = {i: p for i, (p, g) in enumerate(pairs)}
    r = side(gold, pred_of)
    p = side(pred, gold_of)
    f1 = 0.0 if p + r == 0 else 2.0 * p * r / (p + r)
    return p, r, f1


def _muc_df(spark, pairs):
    from fel_spark.operators.evalmetrics import muc_score

    df = spark.createDataFrame(pairs, "pred long, gold long")
    return muc_score(df).collect()[0]


def test_muc_textbook_split(spark):
    # Vilain et al.'s canonical case: one gold cluster {A,B,C,D}, system
    # splits it into {A,B} and {C,D} -> recall (4-2)/(4-1) = 2/3,
    # precision perfect ((2-1)+(2-1)) / ((2-1)+(2-1)) = 1.
    row = _muc_df(spark, [(0, 9), (0, 9), (1, 9), (1, 9)])
    assert row["muc_r_micro"] == 666667
    assert row["muc_p_micro"] == 1000000
    assert row["n_records"] == 4


def test_muc_python_replay_fuzz(spark):
    import random

    rng = random.Random(13)
    for trial in range(4):
        pairs = [
            (rng.randint(0, 6), rng.randint(0, 5)) for _ in range(50)
        ]
        row = _muc_df(spark, pairs)
        p, r, f1 = _py_muc(pairs)
        assert row["muc_p_micro"] == round(p * 1000000), trial
        assert row["muc_r_micro"] == round(r * 1000000), trial
        assert row["muc_f1_micro"] == round(f1 * 1000000), trial


def test_muc_degenerate_all_singletons(spark):
    # all-singleton gold: recall denominator 0 -> 0; likewise precision
    # with all-singleton pred; f1 0 when p + r = 0.
    row = _muc_df(spark, [(0, 0), (1, 1), (2, 2)])
    assert (row["muc_p_micro"], row["muc_r_micro"], row["muc_f1_micro"]) == (
        0,
        0,
        0,
    )


# ---------------------------------------------------------------------------
# BLANC


def _py_blanc(pairs):
    """Plain BLANC (Recasens & Hovy 2011): F over coref links averaged
    with F over non-links, exact pair counting."""
    from itertools import combinations

    n = len(pairs)
    rc = lp = lg = 0
    for (pa, ga), (pb, gb) in combinations(pairs, 2):
        if pa == pb:
            lp += 1
        if ga == gb:
            lg += 1
        if pa == pb and ga == gb:
            rc += 1
    t = n * (n - 1) // 2
    rn = t - lp - lg + rc

    def ratio(a, b):
        return a / b if b else 0.0

    def f(p, r):
        return 0.0 if p + r == 0 else 2.0 * p * r / (p + r)

    f_c = f(ratio(rc, lp), ratio(rc, lg))
    f_n = f(ratio(rn, t - lp), ratio(rn, t - lg))
    if lp == 0 and lg == 0:
        blanc = f_n
    elif t - lp == 0 and t - lg == 0:
        blanc = f_c
    else:
        blanc = (f_c + f_n) / 2.0
    return rc, rn, f_c, f_n, blanc


def _blanc_df(spark, pairs):
    from fel_spark.operators.evalmetrics import blanc_score

    df = spark.createDataFrame(pairs, "pred long, gold long")
    return blanc_score(df).collect()[0]


def test_blanc_python_replay_fuzz(spark):
    import random

    rng = random.Random(17)
    for trial in range(4):
        pairs = [
            (rng.randint(0, 6), rng.randint(0, 5)) for _ in range(40)
        ]
        row = _blanc_df(spark, pairs)
        rc, rn, f_c, f_n, blanc = _py_blanc(pairs)
        assert row["links_right"] == rc, trial
        assert row["nonlinks_right"] == rn, trial
        assert row["blanc_fc_micro"] == round(f_c * 1000000), trial
        assert row["blanc_fn_micro"] == round(f_n * 1000000), trial
        assert row["blanc_micro"] == round(blanc * 1000000), trial


def test_blanc_boundary_conventions(spark):
    # perfect clustering: both F's are 1 -> BLANC 1
    row = _blanc_df(spark, [(0, 0), (0, 0), (1, 1), (2, 2)])
    assert row["blanc_micro"] == 1000000
    # all-singleton pred AND gold: no coref links anywhere -> BLANC = F_n
    row = _blanc_df(spark, [(0, 0), (1, 1), (2, 2)])
    assert row["blanc_fc_micro"] == 0
    assert row["blanc_micro"] == row["blanc_fn_micro"] == 1000000
    # one all-covering cluster in both: no non-links -> BLANC = F_c
    row = _blanc_df(spark, [(0, 5), (0, 5), (0, 5)])
    assert row["blanc_fn_micro"] == 0
    assert row["blanc_micro"] == row["blanc_fc_micro"] == 1000000


# ---------------------------------------------------------------------------
# CEAF (greedy alignment)


def _py_ceaf(pairs, max_rounds=6):
    """Plain replay: greedy one-to-one cluster alignment by
    (phi4_micro DESC, pred ASC, gold ASC), then Luo's ratios."""
    from collections import Counter, defaultdict

    cells = Counter(pairs)
    pn, gn = defaultdict(int), defaultdict(int)
    for (p, g), c in cells.items():
        pn[p] += c
        gn[g] += c
    edges = [
        (p, g, c, round(2.0 * c / (pn[p] + gn[g]) * 1_000_000))
        for (p, g), c in cells.items()
    ]
    used_p, used_g, matched = set(), set(), []
    # bounded locally-dominant rounds == greedy prefix
    for _ in range(max_rounds):
        alive = [
            e for e in edges if e[0] not in used_p and e[1] not in used_g
        ]
        if not alive:
            break
        best_at = {}
        for e in alive:
            for key in (("a", e[0]), ("b", e[1])):
                cur = best_at.get(key)
                if cur is None or (-e[3], e[0], e[1]) < (-cur[3], cur[0], cur[1]):
                    best_at[key] = e
        take = [
            e
            for e in alive
            if best_at[("a", e[0])] == e and best_at[("b", e[1])] == e
        ]
        for p, g, c, s in take:
            used_p.add(p)
            used_g.add(g)
            matched.append((c, s))
    n = sum(cells.values())
    m_sum = sum(c for c, _ in matched)
    e_sum = sum(s for _, s in matched)
    p = e_sum / 1_000_000.0 / len(pn)
    r = e_sum / 1_000_000.0 / len(gn)
    f1 = 0.0 if p + r == 0 else 2.0 * p * r / (p + r)
    return (
        round(m_sum / n * 1_000_000),
        round(p * 1_000_000),
        round(r * 1_000_000),
        round(f1 * 1_000_000),
    )


def _ceaf_df(spark, pairs):
    from fel_spark.operators.evalmetrics import ceaf_scores

    df = spark.createDataFrame(pairs, "pred long, gold long")
    return ceaf_scores(df).collect()[0]


def test_ceaf_perfect(spark):
    row = _ceaf_df(spark, [(0, 10), (0, 10), (1, 11), (2, 12)])
    assert row["ceaf_m_micro"] == 1000000
    assert row["ceaf_e_f1_micro"] == 1000000


def test_ceaf_split_cluster(spark):
    # gold {A,B,C,D}; pred {A,B} {C,D}: best alignment matches one pred
    # cluster (overlap 2): CEAF-m = 2/4; phi4 micro-rounds FIRST:
    # round(2*2/(2+4)*1e6) = 666667, so p = 666667/1e6/2 -> 333334
    # (HALF_UP at the final micro-rounding), r = 666667.
    row = _ceaf_df(spark, [(0, 9), (0, 9), (1, 9), (1, 9)])
    assert row["ceaf_m_micro"] == 500000
    assert row["ceaf_e_p_micro"] == 333334
    assert row["ceaf_e_r_micro"] == 666667


def test_ceaf_python_replay_fuzz(spark):
    import random

    rng = random.Random(17)
    for trial in range(4):
        pairs = [
            (rng.randint(0, 6), rng.randint(0, 5)) for _ in range(60)
        ]
        row = _ceaf_df(spark, pairs)
        m, p, r, f1 = _py_ceaf(pairs)
        assert (
            row["ceaf_m_micro"],
            row["ceaf_e_p_micro"],
            row["ceaf_e_r_micro"],
            row["ceaf_e_f1_micro"],
        ) == (m, p, r, f1), trial


# ---------------------------------------------------------------------------
# correlation-clustering objective


def _corr_df(spark, edges, assign):
    from fel_spark.operators.evalmetrics import correlation_objective

    e = spark.createDataFrame(edges, "src long, dst long")
    a = spark.createDataFrame(assign, "id long, cluster_id long")
    return correlation_objective(e, a).collect()[0]


def test_correlation_objective_pinned(spark):
    # clusters {0,1,2} and {3,4}; edges: 0-1, 1-2 (within), 2-3 (cut);
    # missing within = C(3,2)+C(2,2... C(2,2)=1) = 3+1 - 2 = 2.
    row = _corr_df(
        spark,
        [(0, 1), (1, 2), (2, 3)],
        [(0, 10), (1, 10), (2, 10), (3, 11), (4, 11)],
    )
    assert row["n_edges"] == 3 and row["n_cut"] == 1
    assert row["n_missing_within"] == 2
    assert row["disagreements"] == 3


def test_correlation_objective_perfect_clique_cover(spark):
    row = _corr_df(
        spark,
        [(0, 1), (2, 3)],
        [(0, 5), (1, 5), (2, 6), (3, 6)],
    )
    assert row["disagreements"] == 0


def test_correlation_objective_python_replay_fuzz(spark):
    import random
    from itertools import combinations

    rng = random.Random(29)
    for trial in range(3):
        n = 20
        edges = set()
        while len(edges) < 30:
            a, b = rng.randint(0, n - 1), rng.randint(0, n - 1)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        assign = [(i, rng.randint(0, 4)) for i in range(n)]
        cl = dict(assign)
        cut = sum(1 for a, b in edges if cl[a] != cl[b])
        within_poss = sum(
            1
            for a, b in combinations(range(n), 2)
            if cl[a] == cl[b]
        )
        within_edges = len(edges) - cut
        row = _corr_df(spark, sorted(edges), assign)
        assert row["n_cut"] == cut, trial
        assert row["n_missing_within"] == within_poss - within_edges, trial
        assert row["disagreements"] == cut + within_poss - within_edges


# ---------------------------------------------------------------------------
# Generalized Merge Distance


def _py_gmd(pairs):
    from collections import Counter
    from itertools import combinations

    cells = Counter(pairs)
    preds = {p for p, _ in pairs}
    golds = {g for _, g in pairs}
    cc = len(cells)
    splits = cc - len(preds)
    merges = cc - len(golds)
    dis = 0
    for (pa, ga), (pb, gb) in combinations(pairs, 2):
        if (pa == pb) != (ga == gb):
            dis += 1
    return splits, merges, splits + merges, dis


def test_gmd_python_replay_fuzz(spark):
    import random

    from fel_spark.operators.evalmetrics import gmd_scores

    rng = random.Random(113)
    for trial in range(4):
        pairs = [(rng.randint(0, 6), rng.randint(0, 5)) for _ in range(45)]
        df = spark.createDataFrame(pairs, "pred long, gold long")
        row = gmd_scores(df).collect()[0]
        sp, mg, unit, dis = _py_gmd(pairs)
        assert row["gmd_splits"] == sp, trial
        assert row["gmd_merges"] == mg, trial
        assert row["gmd_unit"] == unit, trial
        assert row["gmd_pair"] == dis, trial


def test_gmd_identical_partitions_zero(spark):
    from fel_spark.operators.evalmetrics import gmd_scores

    pairs = [(i % 4, i % 4) for i in range(20)]
    df = spark.createDataFrame(pairs, "pred long, gold long")
    row = gmd_scores(df).collect()[0]
    assert row["gmd_unit"] == 0 and row["gmd_pair"] == 0


def test_gmd_one_split_one_merge(spark):
    from fel_spark.operators.evalmetrics import gmd_scores

    # pred {a,b}{c}{d} vs gold {a,b}{c,d}: one merge, zero splits
    pairs = [(0, 0), (0, 0), (1, 1), (2, 1)]
    df = spark.createDataFrame(pairs, "pred long, gold long")
    row = gmd_scores(df).collect()[0]
    assert (row["gmd_splits"], row["gmd_merges"]) == (0, 1)
    assert row["gmd_pair"] == 1  # the (c, d) pair joined


# ---------------------------------------------------------------------------
# VI / MI / NMI


def _py_info(pairs):
    from collections import Counter

    n = len(pairs)
    cells = Counter(pairs)
    pn = Counter(p for p, _ in pairs)
    gn = Counter(g for _, g in pairs)

    def ent(counts):
        return math.log(n) - sum(c * math.log(c) for c in counts.values()) / n

    h_p, h_g, h_pg = ent(pn), ent(gn), ent(cells)
    mi = h_p + h_g - h_pg
    vi = h_p + h_g - 2.0 * mi
    nmi = 1.0 if max(h_p, h_g) == 0 else mi / max(h_p, h_g)
    return round(mi * 1e6), round(vi * 1e6), round(nmi * 1e6)


def test_info_scores_python_replay_fuzz(spark):
    import random

    from fel_spark.operators.evalmetrics import info_scores

    rng = random.Random(127)
    for trial in range(4):
        pairs = [(rng.randint(0, 6), rng.randint(0, 5)) for _ in range(60)]
        row = info_scores(_assign(spark, pairs)).collect()[0]
        mi, vi, nmi = _py_info(pairs)
        assert row["mi_micro"] == mi, trial
        assert row["vi_micro"] == vi, trial
        assert row["nmi_micro"] == nmi, trial


def test_info_scores_identical_partitions(spark):
    from fel_spark.operators.evalmetrics import info_scores

    rows = [(i % 4, i % 4) for i in range(40)]
    row = info_scores(_assign(spark, rows)).collect()[0]
    assert row["vi_micro"] == 0
    assert row["nmi_micro"] == 1_000_000


def test_info_scores_trivial_partitions(spark):
    from fel_spark.operators.evalmetrics import info_scores

    # both sides one big cluster: all entropies 0 -> NMI 1 by convention
    rows = [(0, 0) for _ in range(10)]
    row = info_scores(_assign(spark, rows)).collect()[0]
    assert row["vi_micro"] == 0 and row["nmi_micro"] == 1_000_000
