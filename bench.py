#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

    {"metric": "bench_total", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "er": {"turns": N, "sec": S, "turns_per_sec": T}}

Relational/text queries run against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; the ER benchmark runs the
full pipeline (link -> block -> pair -> score -> CC) over a deterministic
synthetic transcript corpus.

Modes:
    python bench.py                       # full battery + ER
    python bench.py --er-only             # ER only (used by scaling study)
    python bench.py --master local[8]     # explicit parallelism (scaling)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "filter_project",
    "agg_pair_counts",
    "agg_marginal",
    "global_totals_cross",
    "join_chain",
    "left_outer_coalesce",
    "composite_key_join",
    "semi_join",
    "topk_window",
    "top1_group",
    "union_merge",
    "events_lag_window",
    "events_daily_rollup",
    "doc_token_stats",
    "doc_fingerprint",
    "doc_langid",
    "doc_repetition",
    "doc_filter",
    "doc_hash_split",
    "doc_span_coverage",
    "doc_pack_chunks",
    "events_sessionize",
    "events_asof",
    "bpe_tokenize_trained",
    "doc_tfidf_topk",
    "media_decode_stats",
    "media_jpeg_stats",
    "warc_extract",
    "conv_integrity",
    "doc_decontaminate",
    "doc_semantic_dedup",
    "knn_bruteforce",
    "minhash_near_dup",
    # r5 late additions: the heaviest of the second ER wave (UDF-bearing
    # comparator scoring; the meta-blocking pair graph) — timed so the
    # driver sees their cost evolve; n_queries in the artifact flags the
    # battery growth for cross-round sum comparisons
    "er_fs_multilevel_scores",
    "er_metablocking",
    # r5 third wave: lossless skew-balanced pair enumeration (the
    # BlockSplit replication/balance trade at bench scale), group
    # linkage (multi-round greedy alignment), collective evidence
    # propagation (two relational join+agg rounds)
    "er_blocksplit_pairs",
    "er_group_linkage",
    "er_collective",
    # r5 seventh wave: the heaviest new decision layers — MCL's matrix
    # self-join rounds and the k-truss oriented triangle peel
    "er_mcl",
    "er_ktruss",
    "corpus_prep_e2e",
    "record_linkage_e2e",
]

# Queries whose input does NOT scale with sf_dir (synthetic fixed-size
# media payloads — the container has no image/audio libs, so media inputs
# are generated, not read from testdata). Their timings are scale-invariant
# and must not be read as sf-scaled numbers (ADVICE r4). Recorded in the
# JSON so cross-scale comparisons can exclude them. corpus_prep_e2e is
# listed because its MEDIA side is fixed-size (its text chain does scale
# with sf_dir).
FIXED_SIZE_QUERIES = [
    "media_decode_stats",
    "media_jpeg_stats",
    "warc_extract",
    "corpus_prep_e2e",
]


def _q_corpus_prep_e2e(spark, sf_dir):
    """Full corpus-prep plan e2e at bench scale: text chain (filter ->
    exact dedup -> minhash near-dup -> split -> pack) over sf_dir's
    documents PLUS the optional media stage (decode-gated filter +
    image/audio/video cross-modality near-dup) over a deterministic
    planted-copy media set. Each rep gets a FRESH run_dir — StageRunner
    resumes from snapshots, so reusing a dir would time a no-op."""
    import atexit
    import shutil
    import tempfile

    from fel_spark.plans.corpus import run_corpus_prep
    from fel_spark.sources.multimodal import (
        synth_media_flac,
        synth_media_jpeg,
        synth_media_png,
        synth_patterned_images,
        synth_patterned_videos,
        synth_toned_audio,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # r5: the compressed-codec tables (really DEFLATE/Huffman/Rice
    # decoded) ride the same media stage, so the e2e timing covers the
    # PNG/JPEG/FLAC decode paths too
    media = (
        synth_patterned_images(spark, 24)
        .unionByName(synth_toned_audio(spark, 16))
        .unionByName(synth_patterned_videos(spark, 12))
        .unionByName(synth_media_png(spark, 12))
        .unionByName(synth_media_jpeg(spark, 12))
        .unionByName(synth_media_flac(spark, 8))
    )
    run_dir = tempfile.mkdtemp(prefix="fel_bench_corpus_")
    atexit.register(shutil.rmtree, run_dir, ignore_errors=True)
    return run_corpus_prep(
        spark,
        run_dir,
        docs,
        pack_budget=2048,
        pack_shards=8,
        media=media,
        media_dedup=True,
    )


def _q_record_linkage_e2e(spark, sf_dir):
    """Unsupervised record-linkage plan e2e at bench scale (r5,
    plans/recordlinkage.py): phonetic+SNM blocking -> comparator levels
    -> label-free multilevel-FS EM -> scoring -> CC clusters -> golden
    records, all as StageRunner snapshots. Records are name-like keys
    derived from sf_dir's documents (first three text tokens), so the
    stage SCALES with sf. Fresh run_dir per rep (resume would no-op)."""
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from fel_spark.plans.recordlinkage import run_record_linkage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    records = docs.select(
        F.col("doc_id").alias("record_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("name"),
    ).filter(F.length("name") > 0)
    run_dir = tempfile.mkdtemp(prefix="fel_bench_rl_")
    atexit.register(shutil.rmtree, run_dir, ignore_errors=True)
    return run_record_linkage(spark, run_dir, records)


# bench-only entries that are PLANS, not registry queries: they write
# StageRunner snapshots as a side effect, so they live here rather than in
# __spark_entry__.queries() (every registry entry is a pure DataFrame).
EXTRA_QUERIES = {
    "corpus_prep_e2e": _q_corpus_prep_e2e,
    "record_linkage_e2e": _q_record_linkage_e2e,
}


def _materialize(df) -> int:
    """Full materialization through a noop sink (no driver collect)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_relational(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as E

    qs = {**E.queries(), **EXTRA_QUERIES}
    # session warmup, untimed: JVM/codegen JIT, python worker pool spin-up,
    # and parquet footer reads are session costs, not query costs — the ER
    # bench pays them the same way (its full-size untimed warmup run)
    _materialize(qs[BENCH_QUERIES[0]](spark, sf_dir))
    # per-query best-of-N: single-shot timings on this host swing 1.5-4x
    # under CPU-steal storms (see rep_secs in the ER section); the minimum
    # tracks engine capacity
    reps = max(1, int(os.environ.get("FEL_BENCH_Q_REPS", "2")))
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            _materialize(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
            # queries that persist() internally build plan-identical frames
            # on rep 2 and would be served from rep 1's materialized cache —
            # evict so every rep pays the full compute (ADVICE r3)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
    return out


def run_er_bench(spark, n_conv: int, turns_per_conv: int, n_entities: int) -> dict:
    from fel_spark.operators.context import EmbeddingMatrix, broadcast_embeddings
    from fel_spark.plans.pipeline import run_er
    from fel_spark.sources.synth import (
        alias_dict_df,
        build_dict_pack,
        embeddings_df,
        entities_df,
        synth_transcripts_df,
        transcripts,
    )

    from fel_spark.operators.mentions import prepare_candidate_dict

    pack = build_dict_pack(n_entities=n_entities, seed=42)
    ad = alias_dict_df(spark, pack).cache()
    ad.count()
    ents = entities_df(spark, pack)
    bc = broadcast_embeddings(spark, EmbeddingMatrix.from_spark(embeddings_df(spark, pack)))
    # the pre-scored candidate dictionary is a STARTUP artifact (FEL loads
    # its datapack once, FastEntityLinker.java:474) — build and pin it
    # outside the timed region so reps measure linking, not dict prep
    cand_dict = prepare_candidate_dict(ad, ents).localCheckpoint(eager=True)

    turns = n_conv * turns_per_conv
    # 5 reps (r4 judge ask): the host suffers multi-minute CPU-steal storms
    # that can land on any rep (BENCH_r04 rep_secs [31.7, 188.0, 59.8]);
    # with >=5 reps the artifact itself shows convergence — best tracks
    # engine capacity, median shows the storm if one hit.
    reps = max(1, int(os.environ.get("FEL_BENCH_ER_REPS", "5")))
    # materialize the corpus once — the production input is an Iceberg/
    # Parquet table, not an on-the-fly generator; the measured job starts
    # from stored rows
    corpus = transcripts(
        synth_transcripts_df(spark, pack, n_conv=n_conv, turns_per_conv=turns_per_conv)
    ).localCheckpoint(eager=True)

    # FULL-SIZE untimed warmup: a 1/8-size warmup left the first measured
    # rep paying a variable 2-5x first-full-size-encounter cost (JIT of
    # full-size hash/shuffle paths + allocator/page-cache settling after
    # the corpus checkpoint; observed rep1 41-126 s vs 23-25 s steady).
    # The reported number is STEADY-STATE throughput — FEL's MeasureSpeed
    # likewise reports ms/query on a long-running warmed process
    # (utils/MeasureSpeed.java:29-52, datapack loaded once at startup).
    run_er(corpus, ad, ents, bc_emb=bc, cand_dict=cand_dict).mentions.count()

    secs, n_mentions = [], 0
    for _ in range(reps):
        t0 = time.time()
        res = run_er(corpus, ad, ents, bc_emb=bc, cand_dict=cand_dict)
        n_mentions = res.mentions.count()
        secs.append(time.time() - t0)
    best = min(secs)
    median = sorted(secs)[len(secs) // 2]
    return {
        "turns": turns,
        "mentions": n_mentions,
        "sec": round(best, 2),
        "sec_best": round(best, 2),
        "sec_median": round(median, 2),
        "turns_per_sec": round(turns / best, 1),
        "turns_per_sec_median": round(turns / median, 1),
        "rep_secs": [round(s, 2) for s in secs],
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--master", default=None)
    p.add_argument("--er-only", action="store_true")
    p.add_argument("--skip-er", action="store_true")
    # 240k convs = 1.44M turns: large enough that per-rep fixed costs
    # (broadcast, DP/codegen setup, CC, job scheduling ~8-10 s) stop
    # dominating — 80k convs measured 26.6k turns/s where 240k measures
    # 42k on the same engine, and longer reps also average out the host's
    # steal storms (rep spread 1.17x vs 3-5x at the small size)
    p.add_argument("--er-conv", type=int, default=240_000)
    p.add_argument("--er-turns-per-conv", type=int, default=6)
    p.add_argument("--er-entities", type=int, default=2000)
    args = p.parse_args()

    from fel_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark(app_name="fel_spark_bench", master=args.master)
    t_total = time.time()
    # ER first, on the fresh JVM: it's the headline capacity number, and
    # running it after the 27-query battery measured ~15% slower from
    # accumulated session state (heap/codegen-cache/shuffle litter) than
    # the same job on a clean session. The relational queries are small
    # and each takes best-of-N with its own warmup, so battery order is
    # state-insensitive; ER order is not.
    er = None
    if not args.skip_er:
        er = run_er_bench(spark, args.er_conv, args.er_turns_per_conv, args.er_entities)
        # release ER's checkpoint/broadcast blocks before timing the
        # battery: collect the now-unreferenced DataFrames so py4j frees
        # the JVM refs and the ContextCleaner can drop their blocks
        import gc

        gc.collect()
        spark.catalog.clearCache()
    queries: dict[str, float] = {}
    if not args.er_only:
        queries = run_relational(spark, sf_dir)
    total = round(time.time() - t_total, 2)
    # `value` is harness wall-clock (warmup passes + all reps + synthetic
    # corpus generation included — NOT comparable across rounds when rep/
    # warmup counts change); `sum_best_sec` is engine time: best rep of
    # each query plus the best ER rep, the capacity number to track.
    # NOTE sum_best_sec is also NOT comparable across rounds when the
    # battery GROWS (each added query adds its own best-rep time); use
    # `n_queries` to normalize — compare per-query medians or the common
    # subset across rounds (ADVICE r4).
    sum_best = round(
        sum(queries.values()) + (er["sec"] if er else 0.0), 2
    )
    result = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "sum_best_sec": sum_best,
        "n_queries": len(queries),
        "fixed_size_queries": [q for q in FIXED_SIZE_QUERIES if q in queries],
        "queries": queries,
        "sf": sf,
        "er": er,
        "master": spark.sparkContext.master,
    }
    spark.stop()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
