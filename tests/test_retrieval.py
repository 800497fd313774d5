"""BM25 retrieval scoring (operators/retrieval.py)."""

from __future__ import annotations

import math

from fel_spark.operators.retrieval import bm25_topk


def _score(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "apple apple banana"),
            ("d2", "apple cherry cherry cherry"),
            ("d3", "banana banana banana banana"),
        ],
        "doc_id string, text string",
    )
    q = spark.createDataFrame([("q0", "apple")], "query_id string, term string")
    rows = {r.doc_id: r for r in bm25_topk(docs, q, k=5).collect()}
    avgdl = (3 + 4 + 4) / 3
    exp_d1 = _score(tf=2, df=2, n_docs=3, dl=3, avgdl=avgdl)
    exp_d2 = _score(tf=1, df=2, n_docs=3, dl=4, avgdl=avgdl)
    assert set(rows) == {"d1", "d2"}  # d3 has no 'apple'
    assert rows["d1"].score_4dp == round(exp_d1 * 10000)
    assert rows["d2"].score_4dp == round(exp_d2 * 10000)
    assert rows["d1"].rank == 1 and rows["d2"].rank == 2


def test_bm25_multi_term_sums_and_k_caps(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", "alpha beta " + "gamma " * i) for i in range(8)],
        "doc_id string, text string",
    )
    q = spark.createDataFrame(
        [("q0", "alpha"), ("q0", "beta")], "query_id string, term string"
    )
    rows = bm25_topk(docs, q, k=3).collect()
    assert len(rows) == 3  # capped
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3]
    # every doc contains both terms once; shorter docs score higher
    top = min(rows, key=lambda r: r.rank)
    assert top.doc_id == "d0"


def test_bm25_rank_key_is_engine_neutral(spark):
    # identical documents -> identical score_4dp; ties break on doc_id ASC
    docs = spark.createDataFrame(
        [("a", "same words here"), ("b", "same words here"),
         ("c", "same words here")],
        "doc_id string, text string",
    )
    q = spark.createDataFrame([("q0", "same")], "query_id string, term string")
    rows = sorted(bm25_topk(docs, q, k=3).collect(), key=lambda r: r.rank)
    assert [r.doc_id for r in rows] == ["a", "b", "c"]
    assert len({r.score_4dp for r in rows}) == 1


def test_bm25_plan_broadcasts_small_sides(spark):
    docs = spark.createDataFrame([("d", "x y z")], "doc_id string, text string")
    q = spark.createDataFrame([("q0", "x")], "query_id string, term string")
    plan = bm25_topk(docs, q)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
