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


def truth_discovery(
    claims: DataFrame,
    rounds: int = 2,
    src_col: str = "source",
    obj_col: str = "obj",
    val_col: str = "val",
    init_acc_micro: int = 500_000,
) -> DataFrame:
    """Iterative truth discovery with source-reliability weights.

    ``rounds`` must be >= 1 (the result is the last round's truth table).

    The fusion layer PAST majority vote (`golden_records`): when sources
    conflict, a vote should count more when it comes from a source that
    has been right elsewhere. The accuracy-weighted-vote fixpoint is the
    core of the truth-discovery literature (Yin, Han & Yu, "TruthFinder",
    KDD 2007; Dong, Berti-Équille & Srivastava, VLDB 2009); the reference
    ranks alias evidence by per-feed aggregate counts the same way its
    Datapack merges per-source alias votes (`io/Datapack.java`).

    ``claims`` is one row per (source, object, claimed value); duplicate
    claims from one source are collapsed first (DISTINCT) so no source
    votes twice. Exact-integer recurrence (micro units, engine-neutral):

      acc_0(s)        = init_acc_micro for every source
      conf_t(o, v)    = sum acc_{t-1}(s) over sources claiming (o, v)
      truth_t(o)      = argmax_v conf_t  (ties: conf DESC, val ASC)
      acc_t(s)        = floor(1e6 * |claims of s agreeing with truth_t|
                                  / |claims of s|)

    Every round is a pure function of the previous accuracies, so a
    fixed-round run replays as a generated CTE unroll (the repo's
    collective/pivot oracle convention). Returns one row per object:
    (obj, val, conf_micro, n_votes) for the FINAL round's truth plus
    that value's supporting-vote count.

    Scale shape: each round is two hash aggregates (claims keyed by
    (obj, val), then sources keyed by src) and one per-object window
    argmax — all shuffles keyed by object or source, nothing pair-scale,
    nothing driver-side. Accuracies are a source-cardinality table
    (dictionary scale) broadcast back onto claims. Lineage is cut per
    round with a lazy localCheckpoint, the repo's iterative-operator
    convention (swoosh/collective), so Catalyst never sees an
    O(rounds)-deep plan.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    c = (
        claims.select(
            F.col(src_col).alias("src"),
            F.col(obj_col).alias("obj"),
            F.col(val_col).alias("val"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    acc = c.select("src").distinct().select(
        "src", F.lit(init_acc_micro).cast("long").alias("acc_micro")
    )
    w = Window.partitionBy("obj").orderBy(
        F.col("conf_micro").desc(), F.col("val").asc()
    )
    conf = None
    for _ in range(rounds):
        conf = (
            c.join(F.broadcast(acc), "src")
            .groupBy("obj", "val")
            .agg(
                F.sum("acc_micro").cast("long").alias("conf_micro"),
                F.count(F.lit(1)).cast("long").alias("n_votes"),
            )
        )
        truth = (
            conf.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("obj", "val", "conf_micro", "n_votes")
            .localCheckpoint(eager=False)
        )
        agree = truth.select("obj", "val", F.lit(1).alias("_hit"))
        # exact integer floor division (`div`), never float `/` + cast:
        # DuckDB rounds on double->BIGINT casts while Spark truncates.
        acc = (
            c.join(agree, ["obj", "val"], "left")
            .groupBy("src")
            .agg(
                F.expr(
                    "sum(coalesce(_hit, 0)) * 1000000L div count(1)"
                )
                .cast("long")
                .alias("acc_micro")
            )
        )
        last_truth = truth
    return last_truth


def source_accuracies(
    claims: DataFrame,
    rounds: int = 2,
    src_col: str = "source",
    obj_col: str = "obj",
    val_col: str = "val",
    init_acc_micro: int = 500_000,
) -> DataFrame:
    """Per-source reliability after ``rounds`` of `truth_discovery`:
    (src, acc_micro, n_claims) where acc_micro = floor(1e6 * agreeing /
    total) against the FINAL round's truths. Same recurrence, same
    engine-neutral integer algebra — the audit face of the operator."""
    c = (
        claims.select(
            F.col(src_col).alias("src"),
            F.col(obj_col).alias("obj"),
            F.col(val_col).alias("val"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    truth = truth_discovery(
        claims, rounds, src_col, obj_col, val_col, init_acc_micro
    ).select("obj", "val", F.lit(1).alias("_hit"))
    return (
        c.join(truth, ["obj", "val"], "left")
        .groupBy("src")
        .agg(
            F.expr("sum(coalesce(_hit, 0)) * 1000000L div count(1)")
            .cast("long")
            .alias("acc_micro"),
            F.count(F.lit(1)).cast("long").alias("n_claims"),
        )
    )


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
