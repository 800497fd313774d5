"""SparkSession factory tuned for the ER workload.

Local mode stands in for a multi-executor cluster; every knob set here is the
one you would set on a 1000-executor cluster too (AQE, skew-join splitting,
Arrow batching, explicit shuffle parallelism — the reference hand-codes the
same knobs: `pig/aggregate-graph-alias-entity-counts.pig:1` default_parallel
200, `utils/RunFELOntheGrid.java:149` 100 reducers).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# Confs every deployment wants, local[N] or 1000 executors. Kept as data so
# the spark-submit entry (scripts/submit_er.py) applies the identical tuning
# to a cluster session it did not build itself.
TUNED_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def get_spark(
    app_name: str = "fel_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    ``shuffle_partitions`` defaults to the core count — at cluster scale this
    would be 2-3x total cores; AQE coalesces small partitions either way.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    # one BLAS thread per python worker: task parallelism comes from Spark;
    # N workers x N BLAS threads thrashes the host (classic pandas-UDF trap)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("FEL_SPARK_DRIVER_MEM", "48g"))
    )
    # AQE (runtime coalescing, skew-join splitting, SMJ->BHJ), Arrow for
    # every pandas-UDF path, and a 64m broadcast ceiling — the alias dict /
    # embedding matrix must stay broadcastable (reference datapack <3GB per
    # node, README.md:8-10).
    for k, v in TUNED_CONF.items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


def apply_tuned_conf(spark: SparkSession) -> SparkSession:
    """Apply TUNED_CONF to an existing session (spark-submit entry points,
    where the session comes from getOrCreate()): runtime-settable keys
    only, and an explicit --conf on the command line always wins."""
    explicit = spark.sparkContext.getConf()
    for k, v in TUNED_CONF.items():
        try:
            if not explicit.contains(k) and spark.conf.isModifiable(k):
                spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def read_ref(spark: SparkSession, ref: str):
    """Path -> parquet; otherwise a catalog table name (Iceberg / hive /
    temp view — anything ``spark.read.table`` resolves). The shared input
    dispatch for the spark-submit job entries."""
    if "/" in ref or ref.endswith(".parquet"):
        return spark.read.parquet(ref)
    return spark.read.table(ref)
