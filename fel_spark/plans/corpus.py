"""The end-to-end training-corpus preparation plan.

Chains the document-pipeline operators into the standard pretraining data
flow, each stage checkpointed and audited through
:class:`~fel_spark.plans.metrics.StageRunner` (resumable: a re-run skips
completed stages; every stage leaves per-partition lineage metrics):

    raw documents
      -> filter        (corpus_filter_decisions: per-rule flags + keep)
      [+ media filter  (optional sidecar: decode-gated quality flags over
                        binary media columns — sources/multimodal.py)]
      -> exact dedup   (normalized-text hash groupBy, canonical per group)
      -> near dedup    (MinHash-LSH clusters, keep cluster canonicals)
      -> semantic dedup (optional, when doc embeddings are supplied:
                        SemDeDup cells + cosine — dedup.semantic_dedup)
      -> decontaminate (optional, when an eval set is supplied: drop docs
                        colliding with benchmark n-grams — dedup.decontaminate)
      -> split         (deterministic hash train/val/test)
      -> pack          (concat-and-chunk token-stream offsets per split)

Stage order is the cheap-to-expensive rule: map-only filtering drops the
junk BEFORE any shuffle; exact dedup (one hash agg) collapses verbatim
copies BEFORE the LSH banding ever sees them; packing runs last on the
smallest surviving set. Audit rows (drop accounting, dedup rates, split
sizes, packing fill) accumulate under the run's ``_aux`` tree so a 100 TB
run can reconcile every dropped document.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from fel_spark.operators.dedup import (
    decontaminate,
    exact_dedup,
    minhash_lsh_dedup,
    semantic_dedup,
)
from fel_spark.operators.filtering import corpus_filter_decisions, filter_audit
from fel_spark.operators.packing import pack_sequences, packing_stats
from fel_spark.operators.splits import hash_split, split_counts
from fel_spark.plans.metrics import StageRunner


def run_corpus_prep(
    spark: SparkSession,
    run_dir: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pack_budget: int = 2048,
    pack_shards: int = 64,
    filter_kwargs: dict | None = None,
    neardup_kwargs: dict | None = None,
    eval_docs: DataFrame | None = None,
    decon_kwargs: dict | None = None,
    doc_embeddings: DataFrame | None = None,
    semdedup_kwargs: dict | None = None,
    media: DataFrame | None = None,
    media_kwargs: dict | None = None,
    media_dedup: bool = False,
) -> DataFrame:
    """Run (or resume) the corpus-prep plan; returns the packed manifest
    (id, split, shard, n_tokens, start_offset, start_chunk, end_chunk).

    Chunk identity in the manifest is (split, chunk_id) — chunk ids are
    namespaced per split's token streams (see pack_sequences), so any
    consumer aggregating or joining on start_chunk/end_chunk must also key
    on ``split`` or it will merge train/val/test chunks.

    Each stage is a parquet snapshot under ``run_dir``; kill the job at any
    point and a re-run picks up after the last completed stage.
    """
    runner = StageRunner(spark, run_dir)

    # scan-parallelism floor: a single-row-group input parquet scans as
    # ONE task, and the filtered snapshot inherits that layout for every
    # downstream stage — spread the corpus once, deterministically by id
    # (guide §2/§6)
    docs = docs.repartition(
        max(2 * spark.sparkContext.defaultParallelism, 8), F.col(id_col)
    )

    def _filtered(r: StageRunner) -> DataFrame:
        fk = dict(filter_kwargs or {})
        if "bc_lang_model" not in fk:
            # default to the SHIPPED weight table (fel_spark/models) — the
            # stopword heuristic is only the explicit bc_lang_model=None
            # opt-out, never the silent default of a production run
            from fel_spark.models import default_langid_model

            fk["bc_lang_model"] = spark.sparkContext.broadcast(
                default_langid_model()
            )
        # decisions feed BOTH the audit and the keep semi-join: pin the
        # (narrow, id+flags) frame once instead of running the full
        # filter compute over the corpus twice
        dec = corpus_filter_decisions(
            docs, id_col=id_col, text_col=text_col, **fk
        ).localCheckpoint(eager=True)
        r.log_aux("filter_audit", filter_audit(dec))
        return docs.join(
            dec.filter(F.col("keep")).select(id_col), id_col, "left_semi"
        )

    filtered = runner.run_stage("filtered", _filtered)

    # optional: multimodal sidecar table — decode-gated quality filter
    # (sources/codecs.py real decoders; corrupt payloads are flagged, never
    # fatal). Runs independently of the text chain: media snapshots don't
    # gate text stages, and omitting `media` keeps existing run_dirs'
    # resume state unchanged.
    if media is not None:

        def _media(r: StageRunner) -> DataFrame:
            from fel_spark.sources.multimodal import media_filter_decisions

            dec = media_filter_decisions(media, **(media_kwargs or {}))
            r.log_aux(
                "media_filter_audit",
                dec.groupBy("kind", "keep", "reason").count(),
            )
            return media.join(
                dec.filter(F.col("keep")).select("media_id"),
                "media_id",
                "left_semi",
            )

        runner.run_stage("media_filtered", _media)

        # optional: per-modality near-dup dedup on the filtered media —
        # image pHash, audio spectral fingerprint, video mean-frame pHash,
        # all through the shared banded-Hamming kernel, clusters collapsed
        # to one canonical (the same pairs -> CC -> keep-min completion the
        # text chain uses)
        if media_dedup:

            def _media_dedup(r: StageRunner) -> DataFrame:
                from fel_spark.sources.multimodal import (
                    audio_fp_pairs,
                    image_phash_pairs,
                    media_neardup_dedup,
                    video_fp_pairs,
                )

                base = r.read_stage("media_filtered")
                pairs = (
                    image_phash_pairs(base)
                    .unionByName(audio_fp_pairs(base))
                    .unionByName(video_fp_pairs(base))
                )
                kept = media_neardup_dedup(base, pairs)
                r.log_aux(
                    "media_dedup_audit",
                    base.groupBy("kind")
                    .count()
                    .withColumnRenamed("count", "n_in")
                    .join(
                        kept.groupBy("kind")
                        .count()
                        .withColumnRenamed("count", "n_kept"),
                        "kind",
                    ),
                )
                return kept

            runner.run_stage(
                "media_deduped", _media_dedup, inputs=("media_filtered",)
            )

    def _exact(r: StageRunner) -> DataFrame:
        # exact_dedup returns one row PER INPUT DOC (doc_id, canonical_id,
        # dup_count) — the audit must count distinct groups and raw rows,
        # not sum dup_count over per-doc rows (which squares group sizes)
        groups = exact_dedup(r.read_stage("filtered"), id_col=id_col, text_col=text_col)
        canon = groups.select(F.col("canonical_id").alias(id_col))
        r.log_aux(
            "exact_dedup_audit",
            groups.agg(
                F.countDistinct("canonical_id").alias("n_groups"),
                F.count("*").alias("n_docs_in"),
            ),
        )
        return r.read_stage("filtered").join(canon, id_col, "left_semi")

    exact = runner.run_stage("exact_deduped", _exact, inputs=("filtered",))

    def _near(r: StageRunner) -> DataFrame:
        base = r.read_stage("exact_deduped")
        clusters = minhash_lsh_dedup(
            base, id_col=id_col, text_col=text_col, **(neardup_kwargs or {})
        )
        # keep one representative per near-dup cluster (cluster_id is the
        # component's canonical id, stringified by connected_components);
        # singleton clusters keep their only member by the same rule.
        drop = clusters.filter(
            F.col(id_col).cast("string") != F.col("cluster_id")
        ).select(id_col)
        r.log_aux(
            "near_dedup_audit",
            clusters.agg(
                F.countDistinct("cluster_id").alias("n_clusters"),
                F.count("*").alias("n_clustered_docs"),
            ),
        )
        return base.join(drop, id_col, "left_anti")

    near = runner.run_stage("near_deduped", _near, inputs=("exact_deduped",))

    # optional: SemDeDup AFTER lexical dedup (semantic copies that survive
    # MinHash — paraphrases, translations-of-boilerplate — are caught on
    # the already-shrunk set). ``doc_embeddings`` maps id -> vector;
    # docs without an embedding row pass through untouched.
    pre_split = "near_deduped"
    if doc_embeddings is not None:

        def _sem(r: StageRunner) -> DataFrame:
            base = r.read_stage("near_deduped")
            emb = base.select(id_col).join(doc_embeddings, id_col, "inner")
            dec = semantic_dedup(
                emb, id_col=id_col, **(semdedup_kwargs or {})
            )
            r.log_aux(
                "semantic_dedup_audit",
                dec.agg(
                    F.count("*").alias("n_embedded_docs"),
                    F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
                    F.countDistinct("sem_cluster_id").alias("n_clusters"),
                ),
            )
            return base.join(
                dec.filter(~F.col("keep")).select(id_col), id_col, "left_anti"
            )

        runner.run_stage("sem_deduped", _sem, inputs=("near_deduped",))
        pre_split = "sem_deduped"

    # optional: benchmark decontamination AFTER dedup (runs the eval-fp
    # probe over the smallest surviving set), BEFORE split (a contaminated
    # doc must not land in any split). Omitting eval_docs keeps the stage
    # list — and any existing run_dir's resume state — unchanged.
    if eval_docs is not None:
        decon_input = pre_split

        def _decon(r: StageRunner) -> DataFrame:
            base = r.read_stage(decon_input)
            dec = decontaminate(
                base, eval_docs, id_col=id_col, text_col=text_col,
                **(decon_kwargs or {}),
            )
            r.log_aux(
                "decontaminate_audit",
                dec.agg(
                    F.count("*").alias("n_docs"),
                    F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
                    F.sum("n_contaminated").alias("n_contaminated_spans"),
                ),
            )
            return base.join(
                dec.filter(F.col("keep")).select(id_col), id_col, "left_semi"
            )

        runner.run_stage("decontaminated", _decon, inputs=(decon_input,))
        pre_split = "decontaminated"

    def _split(r: StageRunner) -> DataFrame:
        out = hash_split(r.read_stage(pre_split), id_col=id_col)
        r.log_aux("split_audit", split_counts(out))
        return out

    # partition the snapshot by split so downstream per-split reads prune
    split = runner.run_stage(
        "split", _split, inputs=(pre_split,), partition_by=("split",)
    )

    def _packed(r: StageRunner) -> DataFrame:
        # group_col='split': each split gets its own token streams, so no
        # chunk ever mixes train/val/test documents (chunk-granularity
        # split leakage would defeat the split)
        return pack_sequences(
            r.read_stage("split"),
            budget=pack_budget,
            n_shards=pack_shards,
            id_col=id_col,
            text_col=text_col,
            group_col="split",
        )

    packed = runner.run_stage("packed", _packed, inputs=("split",))
    # audit from the materialized snapshot — no second window pass. Gated
    # on the audit's own existence (not on stage freshness): a crash in the
    # window between the stage manifest write and this job would otherwise
    # lose the audit forever, since every resume would see the stage done.
    audit_dir = os.path.join(run_dir, "_aux", "packing_audit")
    if not os.path.isdir(audit_dir):
        runner.log_aux(
            "packing_audit",
            packing_stats(packed, budget=pack_budget, group_col="split"),
        )
    return packed
