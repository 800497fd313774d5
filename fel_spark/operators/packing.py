"""Sequence packing: concat-and-chunk documents into fixed token budgets.

The standard pretraining batch-prep step: the tokenized corpus is treated
as one contiguous token stream (documents concatenated in a deterministic
order) and cut into fixed-size chunks; each document lands at a byte-exact
stream offset and may span a chunk boundary. Unlike greedy first-fit
bin-packing (sequential, order-dependent state), concat-and-chunk is pure
window arithmetic — an exclusive running sum of token counts — so it is
deterministic, engine-independent, and runs as ONE window shuffle.

Scale posture: a single global ordering would serialize the window into
one partition, so the stream is sharded first (deterministic hash of the
id into ``n_shards``); each shard is an independent token stream packed in
parallel and chunk ids are made globally unique by offsetting with the
shard index. At 10^12 tokens that is the only formulation that neither
collects the corpus nor funnels it through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fel_spark.operators.textstats import token_count


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_fn=None,
    group_col: str | None = None,
) -> DataFrame:
    """-> (id, [group], shard, n_tokens, start_offset, start_chunk,
    end_chunk).

    ``start_offset`` is the document's position in its stream's
    concatenated token stream (exclusive running sum over ``id`` order);
    ``start_chunk`` / ``end_chunk`` are the ``budget``-sized chunks the
    document's tokens fall into (inclusive; a document spans multiple
    chunks when it crosses a boundary).

    ``group_col`` (e.g. a train/val/test ``split`` label) makes each group
    its own set of token streams: no chunk ever mixes documents from two
    groups — the property a dataset split exists to guarantee. Chunk ids
    are shard * 2^32 + local chunk: globally unique without a group,
    unique per group with one (consumers read chunks per group).

    Empty documents (0 tokens) are dropped — they occupy no stream
    positions and would need an arbitrary chunk assignment.
    """
    s = F.col(id_col).cast("string")
    h = shard_fn(s) if shard_fn is not None else F.xxhash64(s)
    shard = F.pmod(h, F.lit(n_shards))
    stream_cols = ([group_col] if group_col else []) + ["shard"]
    d = docs.select(
        F.col(id_col),
        *([F.col(group_col)] if group_col else []),
        shard.cast("int").alias("shard"),
        token_count(text_col).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy(*stream_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    out = d.withColumn("start_offset", start)
    chunk_base = F.col("shard").cast("long") * F.lit(2**32)
    return out.select(
        id_col,
        *stream_cols,
        "n_tokens",
        "start_offset",
        (chunk_base + F.floor(F.col("start_offset") / budget)).alias("start_chunk"),
        (
            chunk_base
            + F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / budget)
        ).alias("end_chunk"),
    )


def packing_stats(
    packed: DataFrame, budget: int = 2048, group_col: str | None = None
) -> DataFrame:
    """One-row audit: total tokens, chunk count, and mean fill of the final
    (ragged) chunk per stream — quantifies the padding waste the packing
    trades for fixed shapes. Pass the same ``group_col`` as the packing:
    each (group, shard) pair is its own stream with its own ragged tail."""
    stream_cols = ([group_col] if group_col else []) + ["shard"]
    per_shard = packed.groupBy(*stream_cols).agg(
        F.sum("n_tokens").alias("shard_tokens"),
    )
    return per_shard.agg(
        F.sum("shard_tokens").alias("total_tokens"),
        F.sum(F.ceil(F.col("shard_tokens") / budget)).alias("n_chunks"),
        F.avg(
            F.pmod(F.col("shard_tokens") - 1, F.lit(budget)) + 1
        ).alias("mean_last_chunk_fill"),
    )
