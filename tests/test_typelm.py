"""M9: per-type n-gram LM — build + Dirichlet-smoothed scoring parity.

Naive references transcribe `utils/TypeLanguageModel.java:116-157`
(getTrigrams) and `view/LMLREntityContext.java:66-83` (getScoreOf).
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from fel_spark.operators import typelm as TL


def _naive_ngrams(words):
    q = []
    l = len(words)
    for i in range(l - 2):
        q.append(words[i])
        q.append(words[i] + "_" + words[i + 1])
        q.append(words[i] + "_" + words[i + 1] + "_" + words[i + 2])
    if l > 1:
        q.append(words[l - 2] + "_" + words[l - 1])
        q.append(words[l - 2])
    if l > 0:
        q.append(words[l - 1])
    return q


@pytest.mark.parametrize(
    "words",
    [[], ["a"], ["a", "b"], ["a", "b", "c"], ["a", "b", "c", "d", "e"]],
)
def test_ngram_mix_matches_reference(words):
    assert TL.ngram_mix(words) == _naive_ngrams(words)


def test_ngram_mix_expr_matches_python(spark):
    rows = [
        (0, []),
        (1, ["a"]),
        (2, ["a", "b"]),
        (3, ["a", "b", "c"]),
        (4, ["w1", "w2", "w3", "w4", "w5"]),
    ]
    df = spark.createDataFrame(rows, "i int, toks array<string>")
    got = {
        r["i"]: r["ng"]
        for r in df.select("i", TL.ngram_mix_expr(F.col("toks")).alias("ng")).collect()
    }
    for i, toks in rows:
        assert got[i] == TL.ngram_mix(toks), (i, got[i])


def _obs(spark):
    rows = [
        ("person", ["born", "in", "york"], 3),
        ("person", ["famous", "actor"], 2),
        ("place", ["city", "in", "york"], 5),
        ("place", ["river", "bank"], 1),
    ]
    return spark.createDataFrame(rows, "type_name string, toks array<string>, freq long")


def test_build_and_score_parity(spark):
    model = TL.build_type_lm(_obs(spark))

    # naive rebuild
    lm, tf, bg, total = {}, {}, {}, 0
    for ty, toks, f in [
        ("person", ["born", "in", "york"], 3),
        ("person", ["famous", "actor"], 2),
        ("place", ["city", "in", "york"], 5),
        ("place", ["river", "bank"], 1),
    ]:
        for ng in _naive_ngrams(toks):
            lm[(ty, ng)] = lm.get((ty, ng), 0) + f
            tf[ty] = tf.get(ty, 0) + f
            bg[ng] = bg.get(ng, 0) + f
            total += f
    assert model.lm == lm
    assert model.type_freqs == tf
    assert model.background == bg
    assert model.total_freq == total

    # scoring: LMLREntityContext.getScoreOf transcription
    ctx = ["in", "york"]
    ngrams = _naive_ngrams(ctx)

    def naive_score(ty):
        if ty not in tf:
            return TL.DEFAULT_SCORE
        s = 0.0
        for w in ngrams:
            f = lm.get((ty, w))
            if f is not None:
                s += math.log(
                    (f + TL.MU_LM * (bg.get(w, 0) / total)) / (tf[ty] + TL.MU_LM)
                )
        return s if s != 0.0 else TL.DEFAULT_SCORE

    for ty in ("person", "place", "unknown"):
        assert abs(model.score(ty, ngrams) - naive_score(ty)) < 1e-12

    # Spark scorer end-to-end
    bc = TL.broadcast_type_lm(spark, model)
    df = spark.createDataFrame(
        [("person", ctx), ("place", ctx), ("unknown", ctx), ("person", [])],
        "type_name string, toks array<string>",
    )
    got = TL.type_lm_scores(df, bc).collect()
    assert abs(got[0]["type_lm_score"] - naive_score("person")) < 1e-12
    assert abs(got[1]["type_lm_score"] - naive_score("place")) < 1e-12
    assert got[2]["type_lm_score"] == TL.DEFAULT_SCORE
    assert got[3]["type_lm_score"] == TL.DEFAULT_SCORE  # no ngrams -> 0 -> default
