"""End-to-end UNSUPERVISED record-linkage plan: the second-wave ER
operators composed as one resumable pipeline.

    blocking (phonetic + sorted-neighborhood, unioned with provenance)
      -> comparator features (JW / edit-ratio / token-Jaccard levels)
      -> label-free model (multi-level FS via EM on the level-pattern
         histogram; persisted as a versioned JSON artifact)
      -> pair scoring (exact-integer level-weight sums)
      -> match decision (positive log-likelihood ratio)
      -> clusters (configurable decision layer: transitive connected
         components, star clustering, or parallel-pivot correlation
         clustering; singletons kept either way)
      -> golden records (majority-vote survivorship)

Every stage is a parquet snapshot under ``run_dir`` via
:class:`~fel_spark.plans.metrics.StageRunner` — kill the job anywhere
and a re-run resumes after the last completed stage (the reference's
stage-gated driver, `mine-datapack.sh`, promoted to manifested
snapshots). Block-size and cluster-quality audits ride along as aux
snapshots (`phonetic_audit`, `cluster_audit`, `corr_objective` — the
correlation-clustering disagreement count that makes the decision-layer
choice auditable).

Scale shape: both blocking rules are bounded (phonetic blocks are
audited and cappable upstream; SNM is O(n*w) by construction); the
comparator stage is map-only past the candidate join (one Arrow JW
stage, everything else codegen); EM's corpus-scale work is ONE hash
aggregate; scoring is a broadcast join + pair-keyed sum; CC is the
gated driver-fast-path/checkpointed-distributed implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fel_spark.plans.metrics import StageRunner

FEATURE_LEVELS = {"jw_level": 3, "lev_level": 3, "tok_level": 3}


def _candidate_pairs(
    records: DataFrame,
    id_col: str,
    name_col: str,
    snm_window: int,
    pairgen: str = "plain",
    max_block: int = 200,
) -> DataFrame:
    """Union of two blocking rules with provenance: Soundex of the first
    name token, and sorted-neighborhood over the normalized name key.

    ``pairgen`` picks the phonetic rule's self-join strategy: ``"plain"``
    (one equi-join — a Zipf-hot Soundex code becomes one quadratic join
    partition, left to AQE skew splitting) or ``"blocksplit"``
    (`loadbalance.blocksplit_pairs` — the hot code's work is sliced into
    bounded tasks, max_block rows each, with ZERO lost pairs; the pair
    set is provably identical, only the physical balance changes)."""
    from fel_spark.functions.phonetic import soundex_col
    from fel_spark.operators.blocking import sorted_neighborhood_pairs

    norm = F.lower(F.trim(F.col(name_col)))
    base = records.select(
        F.col(id_col).alias("rid"), norm.alias("_name")
    ).filter(F.length("_name") > 0)
    phon = base.withColumn(
        "bk", soundex_col(F.split(F.col("_name"), " ")[0])
    ).filter(F.col("bk").isNotNull())
    if pairgen == "blocksplit":
        from fel_spark.operators.loadbalance import blocksplit_pairs

        p_phon = blocksplit_pairs(
            phon.select("rid", F.col("bk").alias("block_key")),
            id_col="rid",
            max_block=max_block,
        ).select(
            F.col("rid_a").alias("id_a"),
            F.col("rid_b").alias("id_b"),
            F.lit("phonetic").alias("rule"),
        )
    else:
        a = phon.select(F.col("rid").alias("id_a"), "bk")
        b = phon.select(F.col("rid").alias("id_b"), "bk")
        # phonetic codes are few: broadcast the build side so the pair
        # enumeration streams the probe side fully parallel (guide §3.1)
        p_phon = (
            a.join(F.broadcast(b), "bk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.lit("phonetic").alias("rule"))
        )
    p_snm = sorted_neighborhood_pairs(
        base, "_name", id_col="rid", window=snm_window
    ).select("id_a", "id_b", F.lit("snm").alias("rule"))
    both = p_phon.unionAll(p_snm)
    return both.groupBy("id_a", "id_b").agg(
        F.array_sort(F.collect_set("rule")).alias("rules")
    )


def _features(pairs: DataFrame, records: DataFrame, id_col: str, name_col: str) -> DataFrame:
    """Attach graded comparator levels.

    r6 shape: every comparator is a pure function of the NAME pair, and
    names repeat across records (the bench corpus has ~2.2 records per
    distinct name, so ~5x name-pair duplication in the candidate set).
    Records map to dense name ids, the expensive comparators (Arrow JW
    kernel, Levenshtein, token Jaccard) run once per DISTINCT name-id
    pair, and one narrow int-keyed join fans the levels back out to the
    record pairs (guide §2.3 — shuffle keys, not payloads; §4 — fewer
    rows across the Python boundary). Emitted levels are identical."""
    from fel_spark.functions.sim import jaro_winkler_pudf
    from pyspark.sql import Window as W

    norm = F.lower(F.trim(F.col(name_col)))
    names0 = records.select(F.col(id_col).alias("_rid"), norm.alias("_nm"))
    nid = (
        names0.select("_nm")
        .distinct()
        .withColumn("_nid", F.row_number().over(W.orderBy("_nm")))
    )
    names = names0.join(F.broadcast(nid), "_nm")
    j = (
        pairs.join(
            F.broadcast(
                names.select(
                    F.col("_rid").alias("id_a"), F.col("_nid").alias("_nid_a")
                )
            ),
            "id_a",
        ).join(
            F.broadcast(
                names.select(
                    F.col("_rid").alias("id_b"), F.col("_nid").alias("_nid_b")
                )
            ),
            "id_b",
        )
    )
    np = (
        j.select("_nid_a", "_nid_b")
        .distinct()
        .join(
            F.broadcast(
                nid.select(F.col("_nid").alias("_nid_a"), F.col("_nm").alias("_nm_a"))
            ),
            "_nid_a",
        )
        .join(
            F.broadcast(
                nid.select(F.col("_nid").alias("_nid_b"), F.col("_nm").alias("_nm_b"))
            ),
            "_nid_b",
        )
    )
    jw = jaro_winkler_pudf(F.col("_nm_a"), F.col("_nm_b"))
    lev_ratio = F.levenshtein(F.col("_nm_a"), F.col("_nm_b")) / F.greatest(
        F.length("_nm_a"), F.length("_nm_b")
    )
    ta = F.array_distinct(F.split(F.col("_nm_a"), " "))
    tb = F.array_distinct(F.split(F.col("_nm_b"), " "))
    tok_j = F.size(F.array_intersect(ta, tb)) / F.size(F.array_union(ta, tb))
    npx = np.select(
        "_nid_a",
        "_nid_b",
        F.when(jw >= 0.92, 2).when(jw >= 0.80, 1).otherwise(0)
        .cast("long")
        .alias("jw_level"),
        F.when(lev_ratio <= 0.1, 2).when(lev_ratio <= 0.3, 1).otherwise(0)
        .cast("long")
        .alias("lev_level"),
        F.when(tok_j >= 0.8, 2).when(tok_j >= 0.4, 1).otherwise(0)
        .cast("long")
        .alias("tok_level"),
    )
    return j.select("id_a", "id_b", "rules", "_nid_a", "_nid_b").join(
        npx, ["_nid_a", "_nid_b"]
    ).select("id_a", "id_b", "rules", "jw_level", "lev_level", "tok_level")


def run_record_linkage(
    spark: SparkSession,
    run_dir: str,
    records: DataFrame,
    id_col: str = "record_id",
    name_col: str = "name",
    snm_window: int = 5,
    em_iters: int = 5,
    clusterer: str = "cc",
    pairgen: str = "plain",
    max_block: int = 200,
) -> DataFrame:
    """Run (or resume) the unsupervised record-linkage plan; returns the
    cluster assignment (record_id, cluster_id) with every input record
    present (singletons keep their own id). The trained model is saved
    as ``run_dir/fs_model.json``; golden records land as the
    ``golden`` stage; audits as aux snapshots.

    ``clusterer`` picks the pair-DECISION layer over the positive-LLR
    match edges: ``"cc"`` (transitive connected components — maximal
    recall, chains can over-merge), ``"star"`` (one-shot star
    clustering — radius-1 clusters, chains cannot merge), ``"pivot"``
    (parallel-pivot correlation clustering — radius-1 AND residue
    re-clusters over rounds), ``"mc"`` (merge-center — stars merged
    through shared members, center-free chains never conduct),
    ``"lpa"`` (synchronous label propagation — plurality votes, thin
    bridges out-voted), or ``"mcl"`` (quantized Markov clustering —
    weighted-flow attractors; edge weight = the FS score clamped to
    >= 1). All return the identical shape; the ``corr_objective`` aux
    snapshot records each run's correlation-clustering disagreement
    count so the choice is auditable."""
    from fel_spark.operators.cluster import connected_components
    from fel_spark.operators.evalmetrics import (
        cluster_edge_audit,
        correlation_objective,
    )
    from fel_spark.operators.fusion import golden_records
    from fel_spark.operators.matching import (
        label_propagation,
        merge_center_clusters,
        pivot_clusters,
        star_clusters,
    )
    from fel_spark.operators.mcl import mcl_clusters

    if clusterer not in ("cc", "star", "pivot", "mc", "lpa", "mcl"):
        raise ValueError(f"unknown clusterer: {clusterer!r}")
    if pairgen not in ("plain", "blocksplit"):
        raise ValueError(f"unknown pairgen: {pairgen!r}")
    # scan-parallelism floor: bench inputs are single-row-group parquet
    # (one scan task), and every downstream pair enumeration fans out
    # from the records scan — spread it across the session parallelism
    # once, deterministically (guide §2/§6)
    records = records.repartition(
        max(2 * spark.sparkContext.defaultParallelism, 8), F.col(id_col)
    )
    from fel_spark.operators.linkage import (
        fs_em_train_multilevel,
        fs_multilevel_weights_from_mu,
        fs_score_multilevel,
        save_fs_model,
    )

    runner = StageRunner(spark, run_dir)

    def _pairs_stage(r: StageRunner) -> DataFrame:
        from fel_spark.operators.blocking import phonetic_block_stats

        r.log_aux(
            "phonetic_audit",
            phonetic_block_stats(records, name_col, id_col),
        )
        return _candidate_pairs(
            records, id_col, name_col, snm_window, pairgen, max_block
        )

    pairs = runner.run_stage("pairs", _pairs_stage)

    feats = runner.run_stage(
        "features", lambda r: _features(pairs, records, id_col, name_col)
    )

    def _model_stage(r: StageRunner) -> DataFrame:
        mu = fs_em_train_multilevel(
            feats.select(*FEATURE_LEVELS), FEATURE_LEVELS, iters=em_iters
        )
        import os

        save_fs_model(mu, os.path.join(run_dir, "fs_model.json"))
        return mu

    mu = runner.run_stage("model", _model_stage)

    def _scored_stage(r: StageRunner) -> DataFrame:
        w = fs_multilevel_weights_from_mu(mu)
        return fs_score_multilevel(feats, w, list(FEATURE_LEVELS))

    scored = runner.run_stage("scored", _scored_stage)

    def _clusters_stage(r: StageRunner) -> DataFrame:
        # positive log-likelihood ratio = more likely match than not
        edges = scored.filter(F.col("fs_score_micro") > 0).select(
            F.col("id_a").cast("long").alias("src"),
            F.col("id_b").cast("long").alias("dst"),
            F.greatest(F.col("fs_score_micro").cast("long"), F.lit(1)).alias(
                "w"
            ),
        )
        verts = records.select(F.col(id_col).cast("long").alias("id"))
        if clusterer == "cc":
            assign_l = connected_components(
                edges.drop("w"), vertices=verts
            ).select("id", F.col("component").alias("cluster_id"))
        else:
            if clusterer == "star":
                part = star_clusters(edges, "src", "dst").select(
                    "id", "cluster_id"
                )
            elif clusterer == "pivot":
                part = pivot_clusters(
                    edges, "src", "dst", max_rounds=6
                ).select("id", "cluster_id")
            elif clusterer == "mc":
                part = merge_center_clusters(edges, "src", "dst").select(
                    "id", "cluster_id"
                )
            elif clusterer == "lpa":
                part = label_propagation(
                    edges, "src", "dst", max_rounds=4, include_self=True
                ).select("id", "cluster_id")
            else:  # mcl
                part = mcl_clusters(
                    edges, "src", "dst", weight_col="w", n_iter=3
                ).select("id", F.col("attractor").alias("cluster_id"))
            # edge-less records never appear in the pair graph: singletons
            assign_l = verts.join(part, "id", "left").select(
                "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
            )
        r.log_aux(
            "cluster_audit", cluster_edge_audit(edges, assign_l)
        )
        r.log_aux(
            "corr_objective", correlation_objective(edges, assign_l)
        )
        return assign_l.select(
            F.col("id").alias(id_col), "cluster_id"
        )

    clusters = runner.run_stage("clusters", _clusters_stage)

    def _golden_stage(r: StageRunner) -> DataFrame:
        recs = records.join(clusters, id_col).select("cluster_id", name_col)
        return golden_records(recs, "cluster_id", [name_col])

    runner.run_stage("golden", _golden_stage)
    return clusters
