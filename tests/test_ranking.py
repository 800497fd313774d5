"""ProbabilityRanker fidelity: Spark column formula vs pure-Python reference
implementation of `entityranker/ProbabilityRanker.java:54-72` to 1e-9."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fel_spark.operators import ranking


def py_probability_rank(row: dict, SQEF: float, SLET: float, NE: int, mu: float = 20.0) -> float:
    p_e = (row["QEF"] + 1) / (SQEF + NE)
    p_e_w = (row["LET"] + 1) / (SLET + NE)
    p_l_a_w = (row["LAF"] + 1) / (row["LAT"] + 2)
    p_l_a = (row["QAC"] + 1) / (row["QAT"] + 2)
    p_e_l_a = min(1.0, (row["QAEF"] + mu * p_e) / (row["QAF"] + mu))
    p_e_l_a_w = min(1.0, (row["LAET"] + mu * p_e_w) / (row["LAF"] + mu))
    prior_q = (row["QAT"] + 1) / (row["QAT"] + row["LAT"] + 2)
    s = prior_q * (p_l_a * p_e_l_a + (1 - p_l_a) * p_e) + (1 - prior_q) * (
        p_l_a_w * p_e_l_a_w + (1 - p_l_a_w) * p_e_w
    )
    return math.log(s)


def test_probability_score_matches_reference(spark, dict_pack):
    from fel_spark.sources.synth import alias_dict_df

    ad = alias_dict_df(spark, dict_pack)
    stats = ranking.global_stats(ad)
    st = stats.collect()[0]
    scored = ranking.rank_candidates(ad, stats).collect()
    assert len(scored) > 0
    for r in scored[:200]:
        want = py_probability_rank(r.asDict(), st["SQEF"], st["SLET"], st["NE"])
        assert abs(r["prior_score"] - want) < 1e-9


def test_global_stats_dedups_entities(spark, dict_pack):
    from fel_spark.sources.synth import alias_dict_df

    ad = alias_dict_df(spark, dict_pack)
    st = ranking.global_stats(ad).collect()[0]
    # NE = number of distinct entities, not alias rows
    assert st["NE"] == dict_pack.n_entities
    per_entity = (
        ad.select("entity_id", "QEF").dropDuplicates(["entity_id"]).agg(F.sum("QEF"))
    ).collect()[0][0]
    assert st["SQEF"] == per_entity


def test_npmi_score_ranges(spark, dict_pack):
    from fel_spark.sources.synth import alias_dict_df

    ad = alias_dict_df(spark, dict_pack)
    stats = ranking.global_stats(ad)
    df = ranking.with_global_stats(ad, stats).withColumn("npmi", ranking.npmi_score())
    rows = df.select("npmi").collect()
    assert all(r["npmi"] is not None for r in rows)
    # npmi is bounded by 1 from above
    assert max(r["npmi"] for r in rows) <= 1.0 + 1e-9
