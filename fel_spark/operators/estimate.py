"""Sample-based duplicate-rate estimation for corpus-scale dedup.

Before paying for a full 100 TB dedup pass, estimate what it will find:
sample records, dedup the SAMPLE exactly, and extrapolate the number of
distinct entities with a species-richness estimator. The duplicate
structure of a corpus is exactly an abundance problem — each distinct
entity is a "species", each record an "individual" — so the classic
estimators apply verbatim:

* **Chao1** (Anne Chao, "Nonparametric estimation of the number of
  classes in a population", Scand. J. Statist. 1984):
  ``D_hat = d + f1*(f1-1) / (2*(f2+1))`` (the bias-corrected form,
  defined even when no class was seen twice), where d = classes observed
  in the sample, f1 = classes seen exactly once, f2 = exactly twice.
  A lower bound on the true number of distinct entities.
* **Good-Turing unseen-mass** (Good, Biometrika 1953): ``f1 / n`` — the
  probability the next sampled record belongs to an entity the sample
  has not seen; the standard coverage diagnostic for "is the sample big
  enough".

Both need only the size histogram of the sample's duplicate groups —
one hash aggregate over the sampled slice, then one-row integer
algebra. The sample itself is the engine-neutral deterministic slice
used everywhere in this repo: md5(id) < a hex threshold, so the driver
oracle replays record-for-record (no RNG).

Sampling BY RECORD under-observes group sizes (a duplicate pair
survives the sample only when both members do) — the estimator is
applied to the INDUCED sample abundances, which is the standard
protocol (the individuals-based abundance design in Chao & Chiu,
*Species Richness: Estimation and Comparison*, 2016); callers compare
estimates across sampling rates (the query exposes the rate) rather
than reading one rate as the corpus truth.

100 TB shape: the full corpus is touched only by the sampling filter
(map-only); everything downstream runs on the sample slice. This is
the cheapest operator in the dedup family by construction — that is
its entire point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["dup_rate_estimate"]


def dup_rate_estimate(
    df: DataFrame,
    key_col,
    id_col: str = "record_id",
    sample_hex_prefix: int = 4,
    sample_below: str = "4000",
) -> DataFrame:
    """Estimate corpus duplicate structure from a deterministic sample.

    ``key_col`` is the exact-duplicate key (e.g. a normalized text or a
    fingerprint column); the sample keeps records whose
    ``md5(id)[:sample_hex_prefix] < sample_below`` (hex-string compare —
    the default keeps ~1/4 of records; both knobs are replayed by the
    oracle verbatim).

    One row: n_sampled, d_observed (distinct keys in sample), f1, f2
    (keys seen once / twice), chao1_hat (bias-corrected, micro-floored
    integer), unseen_mass_micro (Good-Turing f1/n), dup_rate_micro
    (1 - d/n in the sample — the naive in-sample duplicate share).
    """
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, sample_hex_prefix)
    sample = df.filter(h < F.lit(sample_below))
    groups = sample.groupBy(F.col(key_col).alias("_k")).agg(
        F.count("*").alias("sz")
    )
    agg = groups.agg(
        F.sum("sz").cast("long").alias("n_sampled"),
        F.count("*").cast("long").alias("d_observed"),
        F.sum(F.when(F.col("sz") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("sz") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    # exact integer floor-division everywhere (Spark `div` == DuckDB `//`
    # on non-negative BIGINTs): f1^2 exceeds double's 2^53 exactness at
    # corpus scale, so no float ever enters the estimate
    # empty-sample contract (ADVICE r5): with zero sampled rows the sums
    # aggregate to NULL — counts are coalesced to 0 and the ratio fields
    # are explicitly NULL (undefined over an empty sample) instead of
    # silently NULL-propagated or an ANSI division error. Non-empty
    # samples evaluate the identical expressions.
    return agg.select(
        F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
        "d_observed",
        F.coalesce("f1", F.lit(0)).cast("long").alias("f1"),
        F.coalesce("f2", F.lit(0)).cast("long").alias("f2"),
        F.when(
            F.col("n_sampled").isNotNull(),
            F.expr("d_observed + (f1 * (f1 - 1)) div (2 * (f2 + 1))"),
        )
        .cast("long")
        .alias("chao1_hat"),
        F.when(
            F.col("n_sampled") > 0, F.expr("(f1 * 1000000) div n_sampled")
        )
        .cast("long")
        .alias("unseen_mass_micro"),
        F.when(
            F.col("n_sampled") > 0,
            F.expr("((n_sampled - d_observed) * 1000000) div n_sampled"),
        )
        .cast("long")
        .alias("dup_rate_micro"),
    )
