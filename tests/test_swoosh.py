"""Swoosh merge-based ER: merge-enabled matches, fixpoint, cap audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from fel_spark.operators.swoosh import (
    entity_profiles,
    hot_feature_audit,
    swoosh_features,
    swoosh_merge,
)


def _feats(spark, sets: dict):
    rows = [(rid, tok) for rid, toks in sets.items() for tok in toks]
    return spark.createDataFrame(rows, ["rid", "tok"])


def test_merge_enables_new_match(spark):
    """The Swoosh differentiator: r3 matches NEITHER r1 nor r2 alone
    (one shared feature each, threshold 2), but matches their MERGED
    record — plain CC over the initial pair set would leave r3 out."""
    f = _feats(
        spark,
        {
            1: {"a", "b", "c"},
            2: {"b", "c", "d"},
            3: {"a", "d", "x"},
        },
    )
    # initial matches at k=2: only (1,2). After merging -> {a,b,c,d},
    # which shares {a,d} with r3.
    got = {
        r["rid"]: r["entity"]
        for r in swoosh_merge(f, min_overlap=2, rounds=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}
    # one-round state == plain CC over initial matches: r3 still alone
    one = {
        r["rid"]: r["entity"]
        for r in swoosh_merge(f, min_overlap=2, rounds=1).collect()
    }
    assert one == {1: 1, 2: 1, 3: 3}


def test_no_match_below_threshold(spark):
    f = _feats(spark, {1: {"a", "b"}, 2: {"b", "c"}, 3: {"x", "y"}})
    got = {
        r["rid"]: r["entity"]
        for r in swoosh_merge(f, min_overlap=2, rounds=2).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3}


def test_fixpoint_equals_pinned_rounds(spark):
    """rounds=None converges to the same assignment as a generous pin,
    on a chain that needs several hash-min rounds."""
    sets = {i: {f"t{i}", f"t{i + 1}", f"s{i}"} for i in range(8)}
    f = _feats(spark, sets)
    fixed = sorted(
        (r["rid"], r["entity"])
        for r in swoosh_merge(f, min_overlap=1, rounds=10).collect()
    )
    fix = sorted(
        (r["rid"], r["entity"])
        for r in swoosh_merge(f, min_overlap=1).collect()
    )
    assert fixed == fix
    assert all(e == 0 for _, e in fix)  # one chain-merged entity


def test_entity_profiles_union_semantics(spark):
    f = _feats(spark, {1: {"a", "b", "c"}, 2: {"b", "c", "d"}, 3: {"z"}})
    assign = swoosh_merge(f, min_overlap=2, rounds=2)
    prof = {
        r["entity"]: (r["n_members"], r["n_toks"])
        for r in entity_profiles(assign, f).collect()
    }
    assert prof == {1: (2, 4), 3: (1, 1)}  # union {a,b,c,d}, singleton {z}


def test_hot_feature_cap_and_audit(spark):
    """A feature shared by everyone is dropped from the match join under
    the cap; the audit reports exactly it."""
    sets = {i: {"hot", f"u{i}"} for i in range(6)}
    f = _feats(spark, sets)
    capped = swoosh_merge(f, min_overlap=1, rounds=2, max_token_df=3)
    assert all(r["rid"] == r["entity"] for r in capped.collect())
    audit = hot_feature_audit(f, 3).collect()
    assert [(r["tok"], r["df"]) for r in audit] == [("hot", 6)]


def test_features_and_plan_shape(spark):
    docs = spark.createDataFrame(
        [(1, "Alpha beta gamma"), (2, "beta gamma delta")],
        ["doc_id", "text"],
    )
    f = swoosh_features(docs, ngram_n=2)
    toks = {
        (r["rid"], r["tok"]) for r in f.collect()
    }
    assert toks == {
        (1, "alpha beta"),
        (1, "beta gamma"),
        (2, "beta gamma"),
        (2, "gamma delta"),
    }
    assign = swoosh_merge(f, min_overlap=1, rounds=2)
    plan = assign._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
