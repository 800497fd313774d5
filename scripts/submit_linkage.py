#!/usr/bin/env python
"""Record-linkage job entry for ``spark-submit --py-files``: the
unsupervised linkage flow (phonetic+SNM blocking -> comparator levels ->
label-free multilevel-FS EM -> scoring -> transitive clusters -> golden
records) as a resumable cluster job, mirroring submit_er/submit_corpus.

    spark-submit \
      --master yarn --deploy-mode cluster \
      --num-executors $N --executor-cores 4 --executor-memory 8g \
      --conf spark.sql.shuffle.partitions=$((N * 8)) \
      --py-files dist/fel_spark.zip \
      scripts/submit_linkage.py \
      --input iceberg_catalog.db.records \
      --id-col record_id --name-col name \
      --run-dir /shared/runs/linkage_$DATE \
      --output /shared/out/clusters

Local smoke:

    spark-submit --master local[4] --py-files dist/fel_spark.zip \
      scripts/submit_linkage.py --input /root/testdata/sf0.001/documents.parquet \
      --id-col doc_id --name-from-text \
      --run-dir /tmp/rl_run --output /tmp/rl_out

``--run-dir`` holds stage snapshots, per-partition lineage metrics, the
audits (_aux/phonetic_audit, _aux/cluster_audit, _aux/corr_objective)
and the trained model
(fs_model.json); a killed run resumes after its last completed stage.
``--output`` receives the cluster assignment (record_id, cluster_id).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="records: parquet path or catalog table")
    ap.add_argument("--id-col", default="record_id")
    ap.add_argument("--name-col", default="name")
    ap.add_argument(
        "--name-from-text",
        action="store_true",
        help="derive the name key from the first 3 tokens of a `text` "
        "column (smoke runs over the documents testdata shape)",
    )
    ap.add_argument("--run-dir", required=True, help="checkpoint/lineage dir")
    ap.add_argument("--output", required=True, help="cluster-assignment output dir")
    ap.add_argument("--snm-window", type=int, default=5)
    ap.add_argument(
        "--pairgen",
        choices=("plain", "blocksplit"),
        default="plain",
        help="phonetic-rule self-join strategy: plain equi-join (AQE "
        "handles skew) or lossless BlockSplit task balancing",
    )
    ap.add_argument("--max-block", type=int, default=200)
    ap.add_argument("--em-iters", type=int, default=5)
    ap.add_argument(
        "--clusterer",
        choices=["cc", "star", "pivot", "mc", "lpa", "mcl"],
        default="cc",
        help="pair-decision layer: transitive CC (default), one-shot "
        "star clustering, parallel-pivot correlation clustering, "
        "merge-center, synchronous label propagation, or quantized "
        "Markov clustering (see _aux/corr_objective for the "
        "disagreement audit of each run)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from fel_spark.session import apply_tuned_conf, read_ref

    spark = apply_tuned_conf(
        SparkSession.builder.appName("fel_spark_linkage").getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from fel_spark.plans.recordlinkage import run_record_linkage

    records = read_ref(spark, args.input)
    name_col = args.name_col
    if args.name_from_text:
        name_col = "name"
        records = records.select(
            args.id_col,
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 1, 3), " "
            ).alias(name_col),
        ).filter(F.length(name_col) > 0)

    t0 = time.time()
    clusters = run_record_linkage(
        spark,
        args.run_dir,
        records,
        id_col=args.id_col,
        name_col=name_col,
        snm_window=args.snm_window,
        em_iters=args.em_iters,
        clusterer=args.clusterer,
        pairgen=args.pairgen,
        max_block=args.max_block,
    )
    (
        clusters.write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(args.output)
    )
    out = spark.read.parquet(args.output)
    n = out.count()
    n_clusters = out.select("cluster_id").distinct().count()
    print(
        json.dumps(
            {
                "job": "fel_spark_linkage",
                "records": n,
                "clusters": n_clusters,
                "clusterer": args.clusterer,
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
