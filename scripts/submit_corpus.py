#!/usr/bin/env python
"""Corpus-prep job entry for ``spark-submit --py-files``: the training-data
flow (filter -> exact dedup -> near dedup -> split -> pack) as a resumable
cluster job, mirroring scripts/submit_er.py.

    spark-submit \
      --master yarn --deploy-mode cluster \
      --num-executors $N --executor-cores 4 --executor-memory 8g \
      --conf spark.sql.shuffle.partitions=$((N * 8)) \
      --py-files dist/fel_spark.zip \
      scripts/submit_corpus.py \
      --input iceberg_catalog.db.documents \
      --run-dir /shared/runs/corpus_$DATE \
      --output /shared/out/packed_manifest

Local smoke:

    spark-submit --master local[4] --py-files dist/fel_spark.zip \
      scripts/submit_corpus.py --input /root/testdata/sf0.01/documents.parquet \
      --run-dir /tmp/corpus_run --output /tmp/corpus_out

``--run-dir`` holds the stage snapshots, per-partition lineage metrics and
the per-stage drop-accounting audits (_aux tree); a killed run resumes
after its last completed stage. ``--output`` receives the packed manifest
(doc_id, split, shard, n_tokens, start_offset, start_chunk, end_chunk).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents: parquet path or catalog table")
    ap.add_argument("--run-dir", required=True, help="checkpoint/lineage dir")
    ap.add_argument("--output", required=True, help="packed-manifest output dir")
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--pack-shards", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fel_spark.session import apply_tuned_conf, read_ref

    spark = apply_tuned_conf(
        SparkSession.builder.appName("fel_spark_corpus").getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from fel_spark.plans.corpus import run_corpus_prep

    t0 = time.time()
    packed = run_corpus_prep(
        spark,
        args.run_dir,
        read_ref(spark, args.input),
        pack_budget=args.pack_budget,
        pack_shards=args.pack_shards,
    )
    (
        packed.write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("split")
        .parquet(args.output)
    )
    out = spark.read.parquet(args.output)
    counts = {
        r["split"]: r["count"] for r in out.groupBy("split").count().collect()
    }
    print(
        json.dumps(
            {
                "job": "fel_spark_corpus",
                "docs_packed": sum(counts.values()),
                "split_counts": counts,
                "wall_sec": round(time.time() - t0, 2),
                "output": args.output,
                "run_dir": args.run_dir,
                "master": spark.sparkContext.master,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
