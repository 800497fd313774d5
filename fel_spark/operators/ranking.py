"""Candidate ranking as pure column arithmetic (no UDFs).

Re-expresses the reference's count-based probabilistic rankers:

- ProbabilityRanker (`entityranker/ProbabilityRanker.java:54-72`): smoothed
  two-source mixture over query-log and anchor-text event spaces, Dirichlet
  smoothing mu=20, log-space output.
- ContextualRanker phase 1 (`entityranker/ContextualRanker.java:98-116`):
  same mixture, mu=10, linear-space (feeds the phase-2 pruning).
- ContextualRanker phase 2 (`entityranker/ContextualRanker.java:127-133`):
  ctx*corr + log(phase1) + sigmoid(len-1), context floor -30.
- NPMIRanker (`entityranker/NPMIRanker.java:26-47`).

All formulas consume the alias-level counts (QAF QAT QAC LAF LAT) and
entity-level counts (QAEF LAET QEF LET) of the alias_dict (FIXTURES.md §2)
plus one-row global stats — FEL's CountAndRecordStats
(`hash/CountAndRecordStats.java:21-83`) becomes a 1-row aggregate DataFrame
cross-joined broadcast onto every candidate row (the same plan shape as the
reference's Pig `GROUP ... ALL` + `CROSS`,
`pig/compute-graph-alias-entity-counts.pig:97-139`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MU_PROBABILITY = 20.0  # ProbabilityRanker.java:27 (mu_0 = mu_1 = 20)
MU_CONTEXTUAL = 10.0  # ContextualRanker.java:29
MIN_CONTEXT = -30.0  # ContextualRanker.java:32
NIL_SCORE = -6.0  # grid threshold, RunFELOntheGrid.java:46


def global_stats(alias_dict: DataFrame) -> DataFrame:
    """One-row totals over the entity space: SQEF, SLET, n_entities.

    Entity marginals repeat per alias row, so dedup to one row per entity
    first (the reference iterates the hash once, CountAndRecordStats.java:47-83).
    """
    ents = alias_dict.select("entity_id", "QEF", "LET").dropDuplicates(["entity_id"])
    return ents.agg(
        F.sum("QEF").alias("SQEF"),
        F.sum("LET").alias("SLET"),
        F.count("*").alias("NE"),
    )


def with_global_stats(df: DataFrame, stats: DataFrame) -> DataFrame:
    """Attach the 1-row totals to every row (broadcast nested-loop cross)."""
    return df.crossJoin(F.broadcast(stats))


def _mixture_score(mu: float) -> Column:
    """The shared two-source mixture. Requires columns:
    QAF QAT QAC LAF LAT QAEF LAET QEF LET SQEF SLET NE. Linear-space."""
    p_e = (F.col("QEF") + 1) / (F.col("SQEF") + F.col("NE"))
    p_e_w = (F.col("LET") + 1) / (F.col("SLET") + F.col("NE"))
    p_l_a_w = (F.col("LAF") + 1) / (F.col("LAT") + 2)
    p_l_a = (F.col("QAC") + 1) / (F.col("QAT") + 2)
    p_e_l_a = F.least(F.lit(1.0), (F.col("QAEF") + mu * p_e) / (F.col("QAF") + mu))
    p_e_l_a_w = F.least(F.lit(1.0), (F.col("LAET") + mu * p_e_w) / (F.col("LAF") + mu))
    prior_q = (F.col("QAT") + 1) / (F.col("QAT") + F.col("LAT") + 2)
    return prior_q * (p_l_a * p_e_l_a + (1 - p_l_a) * p_e) + (1 - prior_q) * (
        p_l_a_w * p_e_l_a_w + (1 - p_l_a_w) * p_e_w
    )


def probability_score(mu: float = MU_PROBABILITY) -> Column:
    """ProbabilityRanker.rank — log-space (ProbabilityRanker.java:70-72)."""
    return F.log(_mixture_score(mu))


def phase1_score(mu: float = MU_CONTEXTUAL) -> Column:
    """ContextualRanker.firstPhaseRanking — linear space."""
    return _mixture_score(mu)


def phase2_score(
    phase1: Column,
    context_score: Column,
    mention_len: Column,
    corr: float = 1.0,
    min_context: float = MIN_CONTEXT,
) -> Column:
    """ContextualRanker.secondPhaseRanking:
    max(ctx, minContext)*corr + log(phase1) + sigmoid(len-1)."""
    ctx = F.greatest(F.coalesce(context_score, F.lit(min_context)), F.lit(min_context))
    len_prior = F.lit(1.0) / (1.0 + F.exp(-(mention_len.cast("double") - 1.0)))
    return ctx * corr + F.log(phase1) + len_prior


def npmi_score() -> Column:
    """NPMIRanker.rank (`entityranker/NPMIRanker.java:26-47`).

    npmi(x,y) = ln(p(x,y)/(p(x)p(y))) / -ln p(x,y), blended over query and
    anchor spaces by priorQ; falls back to the other space when a joint count
    is zero, and to the probability mixture when both are.
    """
    prior_q = (F.col("QAT") + 1) / (F.col("QAT") + F.col("LAT") + 2)
    # query space: joint = QAEF / SQEF; marginals alias QAF/SQEF, entity QEF/SQEF
    p_xy_q = F.col("QAEF") / F.col("SQEF")
    p_x_q = (F.col("QAF") + 1) / F.col("SQEF")
    p_y_q = (F.col("QEF") + 1) / F.col("SQEF")
    npmi_q = F.log(p_xy_q / (p_x_q * p_y_q)) / -F.log(p_xy_q)
    # anchor space
    p_xy_a = F.col("LAET") / F.col("SLET")
    p_x_a = (F.col("LAF") + 1) / F.col("SLET")
    p_y_a = (F.col("LET") + 1) / F.col("SLET")
    npmi_a = F.log(p_xy_a / (p_x_a * p_y_a)) / -F.log(p_xy_a)
    both = prior_q * npmi_q + (1 - prior_q) * npmi_a
    return (
        F.when((F.col("QAEF") > 0) & (F.col("LAET") > 0), both)
        .when(F.col("QAEF") > 0, npmi_q)
        .when(F.col("LAET") > 0, npmi_a)
        .otherwise(_mixture_score(MU_PROBABILITY))
    )


def rank_candidates(
    candidates: DataFrame,
    stats: DataFrame,
    score_col: str = "prior_score",
    mu: float = MU_PROBABILITY,
    log_space: bool = True,
) -> DataFrame:
    """Attach global stats and the probability score to a candidate table."""
    scored = with_global_stats(candidates, stats)
    expr = probability_score(mu) if log_space else phase1_score(mu)
    return scored.withColumn(score_col, expr).drop("SQEF", "SLET", "NE")
