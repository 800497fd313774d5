"""Char n-gram LM perplexity scoring (operators/lmscore.py)."""

from __future__ import annotations

import math

import pytest

from fel_spark.operators.lmscore import char_ngram_counts, doc_lm_scores


def test_counts_and_score_tiny_hand_case(spark):
    # corpus 'ab' -> padded '^^ab': trigrams ^^a, ^ab; contexts ^^, ^a
    docs = spark.createDataFrame([("d", "ab")], "doc_id string, text string")
    model = {(r.ctx, r.nxt): r.cnt for r in char_ngram_counts(docs, 3).collect()}
    assert model == {("^^", "a"): 1, ("^a", "b"): 1}
    out = doc_lm_scores(docs, char_ngram_counts(docs, 3), 3).collect()[0]
    # each event: p = (1 + 1) / (1 + 37) = 2/38
    expected = -math.log2(2 / 38)
    assert out.n_events == 2
    assert out.logppl_4dp == round(expected * 10000)


def test_oov_context_scores_uniform_floor(spark):
    train = spark.createDataFrame([("t", "aaaa")], "doc_id string, text string")
    m = char_ngram_counts(train, 3)
    probe = spark.createDataFrame([("p", "zz")], "doc_id string, text string")
    out = doc_lm_scores(probe, m, 3).collect()[0]
    # '^^z' seen ctx '^^' (total 1) but unseen nxt -> (0+1)/(1+37);
    # '^zz' wholly unseen ctx -> (0+1)/(0+37)
    expected = (-math.log2(1 / 38) - math.log2(1 / 37)) / 2
    assert out.logppl_4dp == round(expected * 10000)


def test_empty_text_produces_no_events(spark):
    docs = spark.createDataFrame(
        [("e", "   "), ("ok", "abc")], "doc_id string, text string"
    )
    m = char_ngram_counts(docs, 3)
    ids = {r.doc_id for r in doc_lm_scores(docs, m, 3).collect()}
    assert ids == {"ok"}  # the empty doc contributes nothing (and no
    # bogus sequence(1,0) grams — the guard in _ngrams)


def test_natural_text_scores_below_shuffled_garbage(spark):
    # an English-ish training corpus ranks character-garbage as more
    # surprising than held-out natural text — the CCNet filter property
    train_rows = [
        (f"t{i}", "the quick brown fox jumps over the lazy dog "
                  "a stitch in time saves nine all that glitters is not gold")
        for i in range(4)
    ]
    train = spark.createDataFrame(train_rows, "doc_id string, text string")
    m = char_ngram_counts(train, 3)
    probe = spark.createDataFrame(
        [("nat", "the brown dog jumps over the gold fox"),
         ("gar", "xq zvv qkj wzx jvq kqz wvx zqj kxw")],
        "doc_id string, text string",
    )
    got = {r.doc_id: r.logppl_4dp for r in doc_lm_scores(probe, m, 3).collect()}
    assert got["nat"] < got["gar"]


def test_lm_plan_model_is_broadcast(spark):
    docs = spark.createDataFrame([("d", "abc def")], "doc_id string, text string")
    m = char_ngram_counts(docs, 3)
    plan = doc_lm_scores(docs, m, 3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
