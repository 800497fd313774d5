#!/usr/bin/env python
"""Production ER job entry for ``spark-submit --py-files`` (north_rule
launch surface; the reference's grid launcher is
`utils/RunFELOntheGrid.java:40-64` + `bash/mine-datapack.sh`).

Package the library once, then submit the SAME job at N and 4N executors:

    python scripts/package_pyfiles.py            # -> dist/fel_spark.zip

    spark-submit \
      --master yarn --deploy-mode cluster \
      --num-executors $N --executor-cores 4 --executor-memory 8g \
      --conf spark.sql.shuffle.partitions=$((N * 8)) \
      --py-files dist/fel_spark.zip \
      scripts/submit_er.py \
      --input  iceberg_catalog.db.transcripts \
      --dict   iceberg_catalog.db.alias_dict \
      --run-dir /shared/runs/er_$DATE \
      --output /shared/out/clusters

(--run-dir stage manifests are checked with driver-local filesystem calls
in this build — point it at a driver-visible shared mount; --output goes
through Spark writers and takes any Hadoop-FS URI.)

Local smoke (what the test suite runs):

    spark-submit --master local[4] --py-files dist/fel_spark.zip \
      scripts/submit_er.py --synth 200 --run-dir /tmp/er_run --output /tmp/er_out

The session comes from ``SparkSession.builder.getOrCreate()`` so
``--master`` / ``--num-executors`` / ``--conf`` belong to spark-submit, not
this script; the engine's tuned confs (AQE, Arrow, skew-join) are applied
only where runtime-settable and never override an explicit ``--conf``.

``--input`` accepts a path (parquet) or a catalog table name (Iceberg et
al. — anything ``spark.read.table`` resolves); ``--run-dir`` makes the run
resumable via checkpointed stages with per-partition lineage metrics
(fel_spark.plans.metrics).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts: parquet path or catalog table")
    ap.add_argument("--dict", dest="dict_ref", help="alias dict: path or table")
    ap.add_argument("--entities", dest="ent_ref", help="entities: path or table")
    ap.add_argument(
        "--synth",
        type=int,
        default=0,
        help="synthesize a deterministic corpus of N conversations instead "
        "of reading --input (smoke/bench mode)",
    )
    ap.add_argument("--run-dir", required=True, help="checkpoint/lineage dir")
    ap.add_argument("--output", required=True, help="cluster output dir")
    ap.add_argument("--threshold", type=float, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fel_spark.session import apply_tuned_conf, read_ref

    spark = apply_tuned_conf(
        SparkSession.builder.appName("fel_spark_er").getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from fel_spark.operators.context import EmbeddingMatrix, broadcast_embeddings
    from fel_spark.plans.metrics import run_er_checkpointed
    from fel_spark.sources.synth import (
        alias_dict_df,
        build_dict_pack,
        embeddings_df,
        entities_df,
        synth_transcripts_df,
        transcripts,
    )

    t0 = time.time()
    if args.synth:
        pack = build_dict_pack(n_entities=max(args.synth // 10, 50), seed=42)
        corpus = transcripts(
            synth_transcripts_df(spark, pack, n_conv=args.synth, turns_per_conv=4)
        )
        ad = alias_dict_df(spark, pack)
        ents = entities_df(spark, pack)
        bc = broadcast_embeddings(
            spark, EmbeddingMatrix.from_spark(embeddings_df(spark, pack))
        )
    else:
        if not (args.input and args.dict_ref and args.ent_ref):
            ap.error("--input, --dict and --entities are required without --synth")
        corpus = read_ref(spark, args.input)
        ad = read_ref(spark, args.dict_ref)
        ents = read_ref(spark, args.ent_ref)
        bc = None

    clustered = run_er_checkpointed(
        spark, args.run_dir, corpus, ad, ents, bc_emb=bc
    )
    (
        clustered.write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(args.output)
    )
    n = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "job": "fel_spark_er",
                "mentions": n,
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
