"""Bucketed Parquet tables — co-located joins across pipeline stages.

Every big equi-join/aggregation in the engine shuffles on its key. When the
SAME key is joined repeatedly across runs (the corpus joined to linked
mentions by conv_id; documents joined to dedup verdicts by doc_id), writing
both sides bucketed by that key amortizes the shuffle into the write: a
bucketed scan exposes the hash-partitioning to the planner, so the join
plans with NO Exchange on either side — the 100 TB pattern where one
materialization pays for every downstream co-located join. (On a production
lakehouse the same declaration is an Iceberg `bucket(N, key)` partition
transform; `DataFrameWriter.bucketBy` is the Spark-catalog form of it and
what this sandbox can execute and plan-test.)

Rules the planner needs to elide the Exchange (asserted in
tests/test_plan_shapes.py):

- both sides bucketed on the join key with the SAME bucket count
  (`n_buckets` mismatches degrade to one-side shuffle);
- the bucket count replaces `spark.sql.shuffle.partitions` as the join's
  parallelism — size it like a shuffle partition count (target
  ~100-200 MB/bucket at the production scale);
- `sort_cols` additionally pre-sorts each bucket file so a sort-merge join
  can skip its Sort when files-per-bucket is 1 (one writer task per
  bucket, e.g. after `repartition(n_buckets, key)`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a catalog Parquet table hash-bucketed by
    ``bucket_col`` into ``n_buckets`` files per partition (optionally
    sorted within buckets). ``table`` may be database-qualified."""
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read of a bucketed table; the scan carries the bucket spec,
    which is what lets the planner drop the join-side Exchange."""
    return spark.table(table)
