"""Clustering evaluation metrics: B-cubed and Adjusted Rand Index.

The reference evaluates linking accuracy query-by-query against Webscope
labels (`utils/EvaluateUtils.java`, `plans/pipeline.pairwise_f1` here).
Entity-RESOLUTION output is a clustering, and the standard clustering
metrics — B-cubed precision/recall (Bagga & Baldwin 1998, the
coreference community's default) and the Adjusted Rand Index (Hubert &
Arabie 1985) — both reduce to aggregates over the (pred, gold)
contingency table, which Spark computes in ONE corpus-scale hash
aggregate:

    cell(p, g) = #records with pred=p and gold=g

    B3 precision = (1/N) * sum_cells c^2 / |pred cluster|
    B3 recall    = (1/N) * sum_cells c^2 / |gold cluster|
    ARI = (a - E) / (M - E),  a = sum_cells C(c,2),
          E = b1*b2/C(N,2),   M = (b1+b2)/2,
          b1 = sum_pred C(|p|,2), b2 = sum_gold C(|g|,2)

(the per-record average of |cell|/|cluster| groups into c * (c/|cluster|)
per cell — the c^2 form above; ARI's a/b1/b2 are exact integers, so the
only doubles are the final ratios).

Everything after the contingency aggregate is dictionary-scale (at most
#pred x #gold occupied cells). No pair materialization anywhere — the
c^2 identity replaces the O(sum c^2) record-pair self-join the naive
formulation would shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bcubed_ari(
    assign: DataFrame,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """One-row DataFrame: n_records, B-cubed precision/recall/F1 and ARI
    in micro units (round(1e6 * x) — engine-replayable integer output).

    ``assign`` has one row per record with its predicted and gold
    cluster ids. F1 is computed as (2.0 * p * r) / (p + r) in that
    exact op order (an oracle replay must mirror it)."""
    cells = assign.groupBy(pred_col, gold_col).agg(F.count("*").alias("c"))
    pred_sizes = cells.groupBy(pred_col).agg(F.sum("c").alias("pn"))
    gold_sizes = cells.groupBy(gold_col).agg(F.sum("c").alias("gn"))
    j = cells.join(pred_sizes, pred_col).join(gold_sizes, gold_col)
    per_cell = j.agg(
        F.sum(F.col("c") * F.col("c") / F.col("pn")).alias("sp"),
        F.sum(F.col("c") * F.col("c") / F.col("gn")).alias("sg"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("a"),
        F.sum("c").cast("long").alias("n"),
    )
    b1 = pred_sizes.agg(
        F.sum(F.col("pn") * (F.col("pn") - 1) / 2).cast("long").alias("b1")
    )
    b2 = gold_sizes.agg(
        F.sum(F.col("gn") * (F.col("gn") - 1) / 2).cast("long").alias("b2")
    )
    s = per_cell.crossJoin(F.broadcast(b1)).crossJoin(F.broadcast(b2))
    p = F.col("sp") / F.col("n")
    r = F.col("sg") / F.col("n")
    n2 = F.col("n") * (F.col("n") - 1) / 2
    e = F.col("b1") * F.col("b2") / n2
    m = (F.col("b1") + F.col("b2")) / 2.0
    ari = F.when(m - e == 0, F.lit(1.0)).otherwise((F.col("a") - e) / (m - e))
    return s.select(
        F.col("n").alias("n_records"),
        F.round(p * 1000000).cast("long").alias("b3_p_micro"),
        F.round(r * 1000000).cast("long").alias("b3_r_micro"),
        F.round((F.lit(2.0) * p * r) / (p + r) * 1000000)
        .cast("long")
        .alias("b3_f1_micro"),
        F.round(ari * 1000000).cast("long").alias("ari_micro"),
    )
