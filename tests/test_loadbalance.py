from __future__ import annotations

from pyspark.sql import functions as F

from fel_spark.operators.blocking import candidate_pairs
from fel_spark.operators.loadbalance import (
    blocksplit_pairs,
    blocksplit_task_audit,
)


def _skewed_blocked(spark, n=400, hot_share=3):
    """One Zipf-hot block (every ``hot_share``-th row) + long-tail blocks;
    a second key ring so some pairs are found via two keys (exercises the
    cross-key dedup)."""
    base = spark.range(n).select(
        F.col("id").alias("mention_id"),
        F.concat(F.lit("s"), (F.col("id") % 97).cast("string")).alias("span"),
    )
    k1 = F.when(F.col("mention_id") % hot_share == 0, F.lit("hot")).otherwise(
        F.concat(F.lit("k"), (F.col("mention_id") % 37).cast("string"))
    )
    k2 = F.concat(F.lit("r"), (F.col("mention_id") % 11).cast("string"))
    return base.withColumn("block_key", F.explode(F.array(k1, k2)))


def test_blocksplit_equals_naive_pairs(spark):
    blocked = _skewed_blocked(spark).cache()
    naive = candidate_pairs(blocked, payload_cols=("span",))
    split = blocksplit_pairs(
        blocked, payload_cols=("span",), max_block=25
    )
    n_rows = [
        tuple(r)
        for r in naive.select("mention_id_a", "mention_id_b", "span_a", "span_b")
        .collect()
    ]
    s_rows = [
        tuple(r)
        for r in split.select("mention_id_a", "mention_id_b", "span_a", "span_b")
        .collect()
    ]
    assert sorted(n_rows) == sorted(s_rows)
    assert len(s_rows) == len(set((a, b) for a, b, *_ in s_rows))
    blocked.unpersist()


def test_blocksplit_all_cold_is_identity(spark):
    blocked = _skewed_blocked(spark, n=60)
    naive = {
        tuple(r)
        for r in candidate_pairs(blocked, payload_cols=()).select(
            "mention_id_a", "mention_id_b"
        ).collect()
    }
    split = {
        tuple(r)
        for r in blocksplit_pairs(blocked, max_block=10_000).select(
            "mention_id_a", "mention_id_b"
        ).collect()
    }
    assert naive == split


def test_blocksplit_audit_bounds(spark):
    blocked = _skewed_blocked(spark).cache()
    max_block = 25
    row = blocksplit_task_audit(blocked, max_block=max_block).collect()[0]
    naive_pairs = candidate_pairs(blocked, payload_cols=()).count()

    assert row.n_hot_blocks >= 1
    # lossless: exact pre-dedup pair mass, >= the deduped candidate count
    assert row.pairs_total >= naive_pairs
    # the whole point: the largest task is far below the hot block's own
    # quadratic mass, and within the ~(2*max_block)^2/4 cross-task ceiling
    # (x*y maximized at x=y=max_block, plus hash-imbalance slack).
    assert row.max_task_pairs < row.max_block_pairs
    assert row.max_task_pairs <= 4 * max_block * max_block
    assert row.replicated_rows > 0
    assert row.n_tasks > row.n_blocks
    blocked.unpersist()


def test_blocksplit_broadcast_side_equals_naive_pairs(spark):
    """The r6 broadcast execution strategy emits the identical pair set
    (multi-key input, so the cross-block dedup path is exercised too)."""
    blocked = _skewed_blocked(spark).cache()
    naive = candidate_pairs(blocked, payload_cols=("span",))
    split = blocksplit_pairs(
        blocked, payload_cols=("span",), max_block=25, broadcast_side=True
    )
    n_rows = sorted(
        tuple(r)
        for r in naive.select(
            "mention_id_a", "mention_id_b", "span_a", "span_b"
        ).collect()
    )
    s_rows = sorted(
        tuple(r)
        for r in split.select(
            "mention_id_a", "mention_id_b", "span_a", "span_b"
        ).collect()
    )
    assert n_rows == s_rows
    blocked.unpersist()


def test_blocksplit_unique_blocks_skips_dedup_same_set(spark):
    """With a DISJOINT blocking scheme, unique_blocks=True (both
    strategies) returns the same unique pair set as the default path."""
    base = spark.range(300).select(
        F.col("id").alias("mention_id"),
        F.when(F.col("id") % 3 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 13).cast("string")))
        .alias("block_key"),
    )
    ref = sorted(
        (r["mention_id_a"], r["mention_id_b"])
        for r in blocksplit_pairs(base, max_block=20).collect()
    )
    for bs in (False, True):
        got = sorted(
            (r["mention_id_a"], r["mention_id_b"])
            for r in blocksplit_pairs(
                base, max_block=20, unique_blocks=True, broadcast_side=bs
            ).collect()
        )
        assert got == ref
        assert len(got) == len(set(got))
