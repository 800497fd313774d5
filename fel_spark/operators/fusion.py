"""Data fusion / survivorship: canonical ("golden") record per cluster.

After blocking + scoring + transitive clustering (`plans/pipeline.run_er`)
an ER system still owes its consumer ONE record per entity. The reference
resolves this for its dictionary by keeping the argmax-scored alias row
per entity (`hash/QuasiSuccinctEntityHash.java` keeps one packed entry
per (alias, entity)); the record-linkage literature calls the general
step *survivorship* or *data fusion* (Bleiholder & Naumann 2008, "Data
Fusion", ACM CSUR). Implemented here as majority vote per attribute with
an engine-neutral tie-break (count DESC, value ASC) — deterministic
across engines and partitionings.

Scale shape: melt the attribute columns into (cluster, attr, value) long
form map-side (explode of a literal-width array — no shuffle), then one
hash aggregate over (cluster, attr, value) with map-side combine, a
key-local window argmax per (cluster, attr), and a cluster-keyed pivot
back to wide. Every shuffle is keyed by cluster — nothing is
corpus-pair-scale, nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def golden_records(
    records: DataFrame,
    cluster_col: str = "cluster_id",
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """One row per cluster: ``(cluster_col, n_members, <attr>,
    <attr>_support, ...)`` where ``<attr>`` is the most frequent
    non-null value of that attribute among the cluster's members
    (ties: smallest value) and ``<attr>_support`` its vote count.

    Attribute values are cast to string for the long-form melt (mixed
    attribute types share one value column); the canonical output is
    therefore string-typed. NULLs never win: they are dropped before
    voting, and an all-null attribute yields NULL canonical value with
    NULL support.
    """
    if attr_cols is None:
        attr_cols = [c for c in records.columns if c != cluster_col]
    kvs = F.array(
        *[
            F.struct(
                F.lit(c).alias("attr"), F.col(c).cast("string").alias("val")
            )
            for c in attr_cols
        ]
    )
    stacked = (
        records.select(F.col(cluster_col), F.explode(kvs).alias("kv"))
        .select(cluster_col, "kv.attr", "kv.val")
        .where(F.col("val").isNotNull())
    )
    counts = stacked.groupBy(cluster_col, "attr", "val").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy(cluster_col, "attr").orderBy(
        F.col("n").desc(), F.col("val").asc()
    )
    best = counts.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") == 1
    )
    wide = (
        best.groupBy(cluster_col)
        .pivot("attr", attr_cols)
        .agg(F.first("val").alias("v"), F.first("n").alias("support"))
    )
    members = records.groupBy(cluster_col).agg(
        F.count("*").cast("long").alias("n_members")
    )
    out = members.join(wide, cluster_col, "left")
    # pivot names columns {attr}_v / {attr}_support; expose {attr} for v
    sel = [F.col(cluster_col), F.col("n_members")]
    for c in attr_cols:
        sel.append(F.col(f"{c}_v").alias(c))
        sel.append(F.col(f"{c}_support").alias(f"{c}_support"))
    return out.select(*sel)
