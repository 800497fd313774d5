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


def test_truth_discovery_weighted_vote_overturns_majority(spark):
    """Fellegi-free fusion fixpoint: round 1 IS majority vote (uniform
    priors), round 2's accuracy weights flip o1 from the 2-vote wrong
    value to the 1-vote value claimed by the source that was right
    everywhere else (the TruthFinder motivating example)."""
    from fel_spark.operators.fusion import source_accuracies, truth_discovery

    rows = [
        ("A", "o1", "x"), ("B", "o1", "y"), ("C", "o1", "y"),
        ("A", "o2", "p"), ("B", "o2", "q"), ("C", "o2", "r"), ("D", "o2", "p"),
        ("A", "o3", "u"), ("B", "o3", "v"), ("C", "o3", "w"), ("D", "o3", "u"),
        ("A", "o4", "m"), ("B", "o4", "n"), ("C", "o4", "o"), ("D", "o4", "m"),
    ]
    df = spark.createDataFrame(rows, "source string, obj string, val string")
    got = {r["obj"]: r for r in truth_discovery(df, rounds=2).collect()}
    # round 1: o1 -> y (1.0M vs 0.5M); accs A=3/4, B=C=1/4, D=3/3
    # round 2: o1 conf x = 750000 > y = 250000 + 250000 -> FLIP to x
    assert got["o1"]["val"] == "x"
    assert got["o1"]["conf_micro"] == 750_000 and got["o1"]["n_votes"] == 1
    for o, v in (("o2", "p"), ("o3", "u"), ("o4", "m")):
        assert got[o]["val"] == v
        assert got[o]["conf_micro"] == 1_750_000 and got[o]["n_votes"] == 2
    acc = {r["src"]: r for r in source_accuracies(df, rounds=2).collect()}
    assert acc["A"]["acc_micro"] == 1_000_000 and acc["A"]["n_claims"] == 4
    assert acc["B"]["acc_micro"] == 0 and acc["C"]["acc_micro"] == 0
    assert acc["D"]["acc_micro"] == 1_000_000 and acc["D"]["n_claims"] == 3


def test_truth_discovery_round1_is_majority_vote(spark):
    """With uniform initial accuracies a single round must equal plain
    majority vote with the (conf DESC, val ASC) tie rule."""
    from fel_spark.operators.fusion import truth_discovery

    rows = [
        ("s1", "a", "v1"), ("s2", "a", "v2"), ("s3", "a", "v2"),
        ("s1", "b", "hi"), ("s2", "b", "zz"),  # tie -> val ASC -> 'hi'
        ("s1", "b", "hi"),  # duplicate claim from one source collapses
    ]
    df = spark.createDataFrame(rows, "source string, obj string, val string")
    got = {r["obj"]: r for r in truth_discovery(df, rounds=1).collect()}
    assert got["a"]["val"] == "v2" and got["a"]["n_votes"] == 2
    assert got["b"]["val"] == "hi" and got["b"]["n_votes"] == 1
    assert got["b"]["conf_micro"] == 500_000


def _truth_replay(claims, rounds, init=500_000):
    """Plain-Python replay of the exact integer recurrence."""
    c = sorted(set(claims))
    acc = {s: init for s, _, _ in c}
    truth = {}
    for _ in range(rounds):
        conf = {}
        for s, o, v in c:
            cur = conf.setdefault((o, v), [0, 0])
            cur[0] += acc[s]
            cur[1] += 1
        truth = {}
        for (o, v), (cm, nv) in conf.items():
            best = truth.get(o)
            if best is None or (cm, _neg(v)) > (best[1], _neg(best[0])):
                truth[o] = (v, cm, nv)
        acc = {}
        tot = {}
        hit = {}
        for s, o, v in c:
            tot[s] = tot.get(s, 0) + 1
            if truth[o][0] == v:
                hit[s] = hit.get(s, 0) + 1
        for s in tot:
            acc[s] = hit.get(s, 0) * 1_000_000 // tot[s]
    return truth, acc, tot


class _neg:
    """Reverse-order wrapper so (conf DESC, val ASC) becomes one max()."""

    def __init__(self, v):
        self.v = v

    def __gt__(self, other):
        return self.v < other.v

    def __eq__(self, other):
        return self.v == other.v


def test_truth_discovery_parity_with_plain_python_replay(spark):
    import random

    rng = random.Random(20260820)
    claims = sorted(
        {
            (
                f"s{rng.randrange(9)}",
                f"o{rng.randrange(25)}",
                f"v{rng.randrange(4)}",
            )
            for _ in range(400)
        }
    )
    df = spark.createDataFrame(claims, "source string, obj string, val string")
    for rounds in (1, 2, 3):
        want_truth, want_acc, want_tot = _truth_replay(claims, rounds)
        got = {
            r["obj"]: (r["val"], r["conf_micro"], r["n_votes"])
            for r in truth_discovery_import()(df, rounds=rounds).collect()
        }
        assert got == want_truth
        got_acc = {
            r["src"]: (r["acc_micro"], r["n_claims"])
            for r in source_accuracies_import()(df, rounds=rounds).collect()
        }
        assert got_acc == {s: (want_acc[s], want_tot[s]) for s in want_tot}


def truth_discovery_import():
    from fel_spark.operators.fusion import truth_discovery

    return truth_discovery


def source_accuracies_import():
    from fel_spark.operators.fusion import source_accuracies

    return source_accuracies
