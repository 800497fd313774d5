"""Lossless skew-balanced candidate-pair generation (BlockSplit).

``blocking.cap_blocks`` bounds hot blocks by SALTING — shards of a hot
block never pair across shards, so intra-block recall above the cap is
deliberately traded away (recovered via multi-key blocking + transitive
closure). That is the right default for near-dup mining, but a record-
linkage run that must enumerate EVERY intra-block pair (the Fellegi-
Sunter scoring path: a missed comparison is a missed match, no second
key recovers it) needs the other classical answer: keep all pairs and
balance the *work* instead.

This module implements the BlockSplit strategy from Kolb, Thor & Rahm,
"Load Balancing for MapReduce-based Entity Resolution" (ICDE 2012; the
Dedoop system) recast onto Spark shuffles:

- blocks at or below ``max_block`` rows pass through untouched (one
  task per block, exactly `blocking.candidate_pairs` behavior);
- a hot block of size s is split into m = ceil(s / max_block) shards by
  a deterministic row hash, and its comparison work becomes m*(m+1)/2
  TASKS: one per shard (the diagonal, within-shard pairs) and one per
  unordered shard pair (cross-shard pairs). Each row is replicated to
  exactly m tasks, every intra-block pair is enumerated in EXACTLY ONE
  task, and no task holds more than ~2*max_block rows — the quadratic
  work of the hottest key is sliced into uniformly bounded units that
  AQE/shuffle can spread across the cluster instead of sinking one
  straggler executor.

Cost model (the paper's): replication factor for a hot block is m per
row (vs 1 for salting), in exchange for ZERO lost pairs. The audit
function reports both sides of that trade so a 100 TB run can log it
next to its lineage metrics.

The pair SET is provably independent of the hash used for sharding —
which is exactly what the driver oracle checks: the naive per-block
self-join (ANSI SQL) must match the split enumeration value-for-value.

The reference never self-joins (its candidate generation is a dictionary
probe, `hash/QuasiSuccinctEntityHash.java:79-82`); this operator exists
for the ER recast, where blocked self-joins are the core join shape
(SURVEY §2.3 J6/J8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_MAX_BLOCK = 200


def _with_shards(
    blocked: DataFrame, id_col: str, max_block: int
) -> DataFrame:
    """Attach shard count ``_m`` (null for cold blocks) and this row's
    deterministic shard index ``_shard`` (null for cold blocks)."""
    sizes = (
        blocked.groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("_bs"))
        .filter(F.col("_bs") > max_block)
    )
    # hot-block size table is tiny by construction (distinct hot keys);
    # broadcast keeps the annotation map-side.
    out = blocked.join(F.broadcast(sizes), "block_key", "left")
    m = F.ceil(F.col("_bs") / F.lit(max_block)).cast("int")
    shard = F.pmod(F.xxhash64(F.col(id_col)), m).cast("int")
    return (
        out.withColumn("_m", m)
        .withColumn("_shard", F.when(F.col("_bs").isNotNull(), shard))
        .drop("_bs")
    )


def blocksplit_pairs(
    blocked: DataFrame,
    id_col: str = "mention_id",
    payload_cols: tuple[str, ...] = (),
    max_block: int = DEFAULT_MAX_BLOCK,
    unique_blocks: bool = False,
    broadcast_side: bool = False,
) -> DataFrame:
    """Enumerate ALL intra-block pairs (id_a < id_b, deduped across
    blocks) with per-task work bounded by ``max_block``.

    ``unique_blocks=True`` declares that every record belongs to at most
    ONE block (disjoint blocking schemes, e.g. a single modulus or a
    single phonetic key). Pairs are then unique by construction — within
    a block the split emits each pair exactly once, and no pair can
    recur across blocks — so the final cross-block ``dropDuplicates``
    (a full shuffle of the quadratic pair stream) is skipped. The
    emitted pair SET is identical either way; only the plan changes.

    ``broadcast_side=True`` switches the execution strategy (same pair
    set, same bounded per-unit work): instead of shuffling both
    replicated sides into m(m+1)/2 keyed join tasks, each hot row's m
    shard-copies probe a BROADCAST of the unreplicated input keyed on
    (block_key, shard) — copy j pairs with shard j, and ``id_a < id_b``
    keeps each unordered pair exactly once (the pair {x, y} is produced
    by x's copy j=shard(y) and y's copy j=shard(x); the orientation
    filter keeps one). Pair enumeration is then fully map-side over any
    input partitioning — no shuffle, no task-key skew. Use it whenever
    the blocked input fits in executor memory (the bench shape); the
    default shuffle-task formulation remains the arbitrarily-large-input
    path (ICDE'12's reduce-task model).

    Drop-in replacement for ``blocking.candidate_pairs`` that never
    drops a pair and never lets one hot key become one giant join
    partition. Each row of a hot block lands in exactly m tasks: its
    own diagonal task (i,i) plus every cross task (i,j)/(j,i) it
    touches; a pair from shards (i,j) is emitted only by task
    (min(i,j), max(i,j)), and only once — cross tasks keep pairs whose
    sides come from DIFFERENT shards (within-shard pairs belong to the
    diagonal task), and ``id_a < id_b`` orients each pair exactly once
    in both task kinds.
    """
    ann = _with_shards(blocked, id_col, max_block)
    cold = ann.filter(F.col("_m").isNull())
    hot = ann.filter(F.col("_m").isNotNull())
    cols = [id_col, *payload_cols]

    if broadcast_side:
        probe_hot = hot.withColumn(
            "_j", F.explode(F.sequence(F.lit(0), F.col("_m") - 1))
        )
        build_hot = hot.select(
            "block_key",
            F.col("_shard").alias("_j"),
            *[F.col(c).alias(f"{c}_b") for c in cols],
        )
        hot_pairs = (
            probe_hot.select(
                "block_key", "_j", *[F.col(c).alias(f"{c}_a") for c in cols]
            )
            .join(F.broadcast(build_hot), ["block_key", "_j"])
            .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
            .drop("block_key", "_j")
        )
        cold_pairs = (
            cold.select(
                "block_key", *[F.col(c).alias(f"{c}_a") for c in cols]
            )
            .join(
                F.broadcast(
                    cold.select(
                        "block_key",
                        *[F.col(c).alias(f"{c}_b") for c in cols],
                    )
                ),
                "block_key",
            )
            .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
            .drop("block_key")
        )
        pairs = hot_pairs.unionByName(cold_pairs)
        if unique_blocks:
            return pairs
        return pairs.dropDuplicates([f"{id_col}_a", f"{id_col}_b"])

    # Replicate each hot row to its m tasks: j ranges over all shards;
    # task id is the unordered (min, max) shard pair.
    task = F.concat_ws(
        "#",
        F.col("block_key"),
        F.least(F.col("_shard"), F.col("_j")).cast("string"),
        F.greatest(F.col("_shard"), F.col("_j")).cast("string"),
    )
    hot_tasks = (
        hot.withColumn("_j", F.explode(F.sequence(F.lit(0), F.col("_m") - 1)))
        .withColumn("_task", task)
        # a row's copy inside its OWN shard's diagonal task (i,i); every
        # copy landing in a cross task (i,j), i<j, has _j != _shard.
        .withColumn("_diag", F.col("_j") == F.col("_shard"))
        .drop("_j", "_m")
    )
    cold_tasks = (
        cold.withColumn("_task", F.col("block_key"))
        .withColumn("_diag", F.lit(True))
        .drop("_m")
    )

    both = hot_tasks.unionByName(cold_tasks)
    a = both.select(
        [F.col(c).alias(f"{c}_a") for c in cols]
        + [
            F.col("_shard").alias("_shard_a"),
            F.col("_diag").alias("_diag_a"),
            F.col("_task"),
        ]
    )
    b = both.select(
        [F.col(c).alias(f"{c}_b") for c in cols]
        + [
            F.col("_shard").alias("_shard_b"),
            F.col("_diag").alias("_diag_b"),
            F.col("_task"),
        ]
    )
    # Keep a joined pair iff it belongs to THIS task: cold blocks keep
    # everything (one task per block); diagonal tasks keep within-shard
    # pairs (their rows are all one shard, _diag true on both sides);
    # cross tasks keep only cross-shard pairs — an equal-shard pair seen
    # there is owned by that shard's diagonal task and must be dropped.
    owned = (
        F.col("_shard_a").isNull()
        | (F.col("_shard_a") != F.col("_shard_b"))
        | (F.col("_diag_a") & F.col("_diag_b"))
    )
    pairs = (
        a.join(b, "_task")
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        .filter(owned)
        .drop("_task", "_shard_a", "_shard_b", "_diag_a", "_diag_b")
    )
    if unique_blocks:
        return pairs
    return pairs.dropDuplicates([f"{id_col}_a", f"{id_col}_b"])


def blocksplit_task_audit(
    blocked: DataFrame,
    id_col: str = "mention_id",
    max_block: int = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """The balance/replication trade, quantified — one row.

    Columns: ``n_blocks``, ``n_hot_blocks``, ``n_tasks`` (comparison
    tasks after splitting), ``pairs_total`` (exact — BlockSplit loses
    none), ``max_block_pairs`` (largest single-block pair count = the
    straggler a naive join would run), ``max_task_pairs`` (largest
    per-task pair count after splitting), ``replicated_rows`` (extra
    row copies shipped, the price paid).
    """
    ann = _with_shards(blocked, id_col, max_block)
    per_block = ann.groupBy("block_key").agg(
        F.count(F.lit(1)).alias("s"),
        F.max("_m").alias("m"),
    )
    block_pairs = (F.col("s") * (F.col("s") - 1) / 2).cast("long")

    # exact per-task pair counts from the realized shard histogram
    shard_sizes = ann.groupBy("block_key", "_shard").agg(
        F.count(F.lit(1)).alias("c")
    )
    diag = shard_sizes.select(
        (F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("task_pairs")
    )
    x = shard_sizes.select("block_key", F.col("_shard").alias("i"), F.col("c").alias("ci"))
    y = shard_sizes.select("block_key", F.col("_shard").alias("j"), F.col("c").alias("cj"))
    cross = (
        x.join(y, "block_key")
        .filter(F.col("i") < F.col("j"))
        .select((F.col("ci") * F.col("cj")).cast("long").alias("task_pairs"))
    )
    task_pairs = diag.unionByName(cross)

    totals = per_block.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.when(F.col("m").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_hot_blocks"),
        F.sum(
            F.when(
                F.col("m").isNotNull(), (F.col("m") * (F.col("m") + 1) / 2)
            ).otherwise(F.lit(1))
        )
        .cast("long")
        .alias("n_tasks"),
        F.sum(block_pairs).cast("long").alias("pairs_total"),
        F.max(block_pairs).cast("long").alias("max_block_pairs"),
        F.sum(
            F.when(F.col("m").isNotNull(), F.col("s") * (F.col("m") - 1)).otherwise(0)
        )
        .cast("long")
        .alias("replicated_rows"),
    )
    max_task = task_pairs.agg(
        F.coalesce(F.max("task_pairs"), F.lit(0)).cast("long").alias("max_task_pairs")
    )
    return totals.crossJoin(max_task)
