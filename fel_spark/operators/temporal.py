"""Temporal record linkage: time-decayed agreement/disagreement evidence.

Li, Dong, Maurino & Srivastava, "Linking temporal records" (VLDB 2011):
when records carry timestamps, match evidence must decay with the time
gap — two observations AGREEING on a value is strong evidence for the
same entity when they are close in time and weaker as the gap grows
(the entity may be a coincidence across eras), while two observations
DISAGREEING is strong evidence AGAINST identity only when close in time
(real-world entities change attribute values: addresses move, tools get
renamed — so an old conflict should barely count). Classical
Fellegi-Sunter treats both as time-invariant, which is exactly what
over-splits long-lived entities and over-merges short-lived ones.

This module implements the deterministic decayed-evidence core with the
repo's exact-integer conventions (the paper's learned decay curves are
replaced by the linear ramp the rest of the repo uses for proximity —
`greatest(0, 1 - gap/window)` — in pure integer micro arithmetic, so
Spark and any ANSI replay agree bit-for-bit; no exp/libm in the
comparison path):

- ``decay_micro(gap, window)`` = max(0, 1e6 - gap * 1e6 / window), all
  integer ops (the floor division IS the fixed-point rounding);
- agreement on the value contributes ``+decay(gap, agree_window)``;
- disagreement contributes ``-decay(gap, disagree_window)`` — with
  disagree_window < agree_window, mirroring the paper's finding that
  disagreement decays FASTER than agreement.

Scale shape: candidate pairs come from the caller's blocking (same as
every pair stage in this repo); past the blocked self-join everything
is pure column math — map-only, whole-stage-codegen, no UDF, no window.

Transcript-native: conversations and turns carry ``ts`` by contract
(the input_hint schema), so this is the pair scorer for "same user
across sessions months apart" — the case attribute-only scoring gets
wrong in both directions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MICRO = 1_000_000


def decay_micro(gap: Column, window: Column | int) -> Column:
    """max(0, 1e6 - gap * 1e6 / window) in exact integer arithmetic.

    ``gap`` and ``window`` are in the same (integer) time unit; result
    is a micro fixed-point weight in [0, 1e6]. Spark's ``/`` on longs is
    double division; floor of it equals exact integer floor-division
    (DuckDB ``//``) whenever gap * 1e6 stays below 2^53 AND the true
    quotient sits further than the double rounding error from an
    integer — the nearest non-exact quotient is 1/window away (>=
    ~1.65e-6 for week-scale windows) vs ~4e-10 rounding error at these
    magnitudes, so the engines agree bit-for-bit for any gap under
    ~9e9 time units.
    """
    w = F.lit(window) if isinstance(window, int) else window
    return F.greatest(
        F.lit(0).cast("long"),
        (F.lit(MICRO) - F.floor(gap.cast("long") * MICRO / w)).cast("long"),
    )


def temporal_pair_scores(
    obs: DataFrame,
    agree_window: int,
    disagree_window: int,
    id_col: str = "rid",
    block_col: str = "bk",
    val_col: str = "val",
    ts_col: str = "ts_sec",
) -> DataFrame:
    """Score same-block observation pairs with time-decayed evidence.

    ``obs``: one row per observation (id, block key, categorical value,
    integer timestamp). Returns (id_a, id_b, agree, gap_sec,
    score_micro) for every same-block pair with id_a < id_b:
    score = +decay(gap, agree_window) when the values agree,
    -decay(gap, disagree_window) when they differ. Null values follow
    SQL equality: a null on either side counts as disagreement — the
    caller filters nulls if absence should be neutral instead.
    """
    a = obs.select(
        F.col(id_col).alias("id_a"),
        F.col(block_col).alias("bk"),
        F.col(val_col).alias("_va"),
        F.col(ts_col).alias("_ta"),
    )
    b = obs.select(
        F.col(id_col).alias("id_b"),
        F.col(block_col).alias("bk"),
        F.col(val_col).alias("_vb"),
        F.col(ts_col).alias("_tb"),
    )
    gap = F.abs(F.col("_ta") - F.col("_tb")).cast("long")
    agree = F.col("_va").eqNullSafe(F.col("_vb"))
    return (
        a.join(b, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            agree.alias("agree"),
            gap.alias("gap_sec"),
            F.when(agree, decay_micro(gap, agree_window))
            .otherwise(-decay_micro(gap, disagree_window))
            .alias("score_micro"),
        )
    )


def value_intervals(
    df: DataFrame,
    entity_col: str,
    value_col: str,
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Entity timelines: collapse ordered per-entity observations into
    VALIDITY INTERVALS per value run — the slowly-changing-dimension
    (SCD type-2) build step, and the output shape Li et al.'s temporal
    linkage consumes as an entity's attribute history. A run is a
    maximal stretch of consecutive observations with the same value
    (gaps-and-islands: island id = observation rank minus same-value
    rank); its interval spans first to last observation, ``valid_to``
    is the NEXT run's start (open on the right; NULL on the current
    run), and ``is_current`` flags each entity's last run.

    ``order_cols`` break timestamp ties deterministically (pass the
    conv_integrity-style neutral key when observations can tie).

    Output: (``entity``, ``value``, ``valid_from``, ``valid_to``,
    ``n_obs``, ``is_current``).

    Scale: every window is partitioned by the entity key — nothing
    global, nothing pair-scale; entity histories parallelize freely.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(entity_col).alias("entity"),
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("_ts"),
        *[F.col(c) for c in order_cols],
    )
    order = [F.col("_ts").asc_nulls_last()] + [F.col(c) for c in order_cols]
    we = W.partitionBy("entity").orderBy(*order)
    wv = W.partitionBy("entity", "value").orderBy(*order)
    runs = (
        base.withColumn(
            "_isl", F.row_number().over(we) - F.row_number().over(wv)
        )
        .groupBy("entity", "value", "_isl")
        .agg(
            F.min("_ts").alias("valid_from"),
            F.count("*").cast("long").alias("n_obs"),
        )
    )
    wn = W.partitionBy("entity").orderBy(F.col("valid_from").asc_nulls_last())
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(wn))
        .withColumn(
            "is_current",
            F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("int"),
        )
        .select(
            "entity", "value", "valid_from", "valid_to", "n_obs", "is_current"
        )
    )
