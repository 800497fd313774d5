from __future__ import annotations

from pyspark.sql import functions as F

from fel_spark.operators.blockscheme import learn_blocking_scheme, rule_keys


def _keyed(spark, mapping):
    rows = [
        (i, rule, key)
        for rule, keys in mapping.items()
        for i, key in keys.items()
    ]
    return spark.createDataFrame(rows, ["id", "rule", "key"])


def test_greedy_scheme_two_steps(spark):
    keyed = _keyed(
        spark,
        {
            "X": {1: "a", 2: "a", 3: "b", 4: "b", 5: "c", 6: "d"},
            "Y": {1: "p", 2: "q", 3: "q", 4: "r", 5: "s", 6: "s"},
        },
    )
    labeled = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
    out = learn_blocking_scheme(keyed, labeled, max_rules=3).collect()
    assert [(r["step"], r["rule"], r["new_matches"], r["cum_matches"]) for r in out] == [
        (1, "Y", 2, 2),
        (2, "X", 1, 3),
    ]
    assert out[0]["recall_4dp"] == 2 * 10000 // 3
    assert out[1]["recall_4dp"] == 10000
    # costs: sum of C(n,2) over blocks -> both rules have two 2-blocks
    assert out[0]["cost_pairs"] == 2 and out[1]["cost_pairs"] == 2


def test_greedy_stops_when_no_gain(spark):
    keyed = _keyed(spark, {"X": {1: "a", 2: "a", 3: "b"}})
    labeled = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    out = learn_blocking_scheme(keyed, labeled, max_rules=5).collect()
    # X covers (1,2) only; after that no rule adds anything
    assert len(out) == 1
    assert (out[0]["rule"], out[0]["new_matches"]) == ("X", 1)


def test_tie_breaks_cost_then_name(spark):
    # B and C both cover the single label; C is cheaper (smaller blocks)
    keyed = _keyed(
        spark,
        {
            "B": {1: "k", 2: "k", 3: "k"},  # one 3-block: cost 3
            "C": {1: "k", 2: "k", 3: "z"},  # one 2-block: cost 1
            "A": {1: "k", 2: "k", 3: "y"},  # cost 1, ties C -> name asc
        },
    )
    labeled = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    out = learn_blocking_scheme(keyed, labeled, max_rules=1).collect()
    assert out[0]["rule"] == "A"


def test_rule_keys_long_format_drops_nulls(spark):
    df = spark.createDataFrame([(1, "en", None), (2, None, "x")], ["id", "lang", "pfx"])
    keyed = rule_keys(df, "id", {"lang": F.col("lang"), "pfx": F.col("pfx")})
    got = {(r["id"], r["rule"], r["key"]) for r in keyed.collect()}
    assert got == {(1, "lang", "en"), (2, "pfx", "x")}
