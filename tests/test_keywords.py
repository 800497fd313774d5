from __future__ import annotations

import math

from pyspark.sql import functions as F

from fel_spark.operators.keywords import tfidf_topk
from fel_spark.operators.textstats import corpus_profile


def test_tfidf_topk_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_topk(df, k=2).orderBy("doc_id", "rnk").collect()
    # N=3; df: apple 2, banana 2, cherry 1
    idf = lambda d: math.log(4.0 / (d + 1.0)) + 1.0
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: apple tf=2 beats banana tf=1 (same idf)
    assert [r.word for r in by_doc[1]] == ["apple", "banana"]
    assert abs(by_doc[1][0].score - 2 * idf(2)) < 1e-12
    # doc 2: cherry (rarer) beats banana
    assert [r.word for r in by_doc[2]] == ["cherry", "banana"]
    assert abs(by_doc[2][0].score - idf(1)) < 1e-12
    # doc 3: only one token -> one row
    assert [r.word for r in by_doc[3]] == ["apple"]
    assert [r.rnk for r in by_doc[1]] == [1, 2]


def test_tfidf_tie_breaks_by_word(spark):
    df = spark.createDataFrame(
        [(1, "zeta alpha"), (2, "zeta alpha")], "doc_id long, text string"
    )
    rows = tfidf_topk(df, k=2).filter("doc_id = 1").orderBy("rnk").collect()
    # identical tf and df -> identical scores -> word ASC wins
    assert [r.word for r in rows] == ["alpha", "zeta"]


def test_corpus_profile_exact_percentiles(spark):
    # token counts 1..10 in one group: R-7 linear interpolation
    docs = [(i, " ".join(["w"] * i), "s1") for i in range(1, 11)]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    row = corpus_profile(df).collect()[0]
    assert row.grp == "s1" and row.n_docs == 10 and row.total_tokens == 55
    assert abs(row.mean_tokens - 5.5) < 1e-12
    assert abs(row.p50_tokens - 5.5) < 1e-12
    assert abs(row.p90_tokens - 9.1) < 1e-9
    assert abs(row.p99_tokens - 9.91) < 1e-9
