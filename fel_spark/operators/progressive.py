"""Progressive (pay-as-you-go) entity resolution schedules.

Whang, Marmaros & Garcia-Molina, "Pay-as-you-go entity resolution"
(TKDE 2013) and Papenbrock, Heise & Naumann, "Progressive duplicate
detection" (TKDE 2015): when the comparison budget may be cut off at
any time, emit the MOST PROMISING comparisons first so matches
concentrate early. Their PSNM (progressive sorted neighborhood) orders
the classic SNM pair stream by sort-rank distance: all distance-1
neighbors first, then distance-2, ... — under the sorted-key locality
assumption each successive wave has strictly lower match density.

``progressive_snm_curve`` materializes that schedule's QUALITY CURVE
against labeled ground truth: per wave d (= rank distance), the pair
budget spent, matches found, and the cumulative early-quality
(matches per comparison) and recall — the artifact that tells an
operator of a 100 TB run where to stop paying.

Scale shape: the pair stream is `blocking.sorted_neighborhood_pairs`
(sharded ranks, band self-join — no global single-partition window);
the label join is one equi-join on the normalized pair key; the curve
itself aggregates to ``window - 1`` rows, so its cumulative window is
dictionary-scale by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fel_spark.operators.blocking import sorted_neighborhood_pairs


def progressive_snm_curve(
    df: DataFrame,
    key_col: str,
    labeled: DataFrame,
    id_col: str = "record_id",
    window: int = 5,
    prefix_len: int = 2,
) -> DataFrame:
    """One row per PSNM wave (rank distance 1..window-1): (wave,
    n_pairs, n_matches, cum_pairs, cum_matches, early_quality_4dp,
    recall_4dp). ``labeled``: ground-truth matched pairs (id_a, id_b),
    any orientation (normalized by id here); recall is measured against
    ALL labeled matches, including those outside the window — the
    honest denominator for a blocking schedule."""
    pairs = sorted_neighborhood_pairs(
        df, key_col, id_col=id_col, window=window, prefix_len=prefix_len
    )
    p = pairs.select(
        (F.col("rank_b") - F.col("rank_a")).cast("long").alias("wave"),
        F.least("id_a", "id_b").alias("_pa"),
        F.greatest("id_a", "id_b").alias("_pb"),
    )
    lab = labeled.select(
        F.least("id_a", "id_b").alias("_pa"),
        F.greatest("id_a", "id_b").alias("_pb"),
        F.lit(1).alias("_m"),
    ).distinct()
    n_total = lab.count()
    per_wave = (
        p.join(lab, ["_pa", "_pb"], "left")
        .groupBy("wave")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.coalesce(F.col("_m"), F.lit(0))).cast("long").alias("n_matches"),
        )
    )
    # <= window-1 rows: the single-partition cumulative window is
    # dictionary-scale by construction
    w = Window.orderBy("wave").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_wave.select(
        "wave",
        "n_pairs",
        "n_matches",
        F.sum("n_pairs").over(w).cast("long").alias("cum_pairs"),
        F.sum("n_matches").over(w).cast("long").alias("cum_matches"),
    )
    recall = (
        F.lit(0).cast("long")
        if n_total == 0
        else F.floor(F.col("cum_matches") * 10000 / F.lit(n_total)).cast("long")
    )
    return cum.select(
        "wave",
        "n_pairs",
        "n_matches",
        "cum_pairs",
        "cum_matches",
        F.floor(F.col("cum_matches") * 10000 / F.col("cum_pairs"))
        .cast("long")
        .alias("early_quality_4dp"),
        recall.alias("recall_4dp"),
    )
