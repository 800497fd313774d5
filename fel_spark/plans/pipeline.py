"""End-to-end entity-resolution pipeline and its evaluation.

transcripts -> link_mentions (span explode + dict join + contextual ranking
+ segmentation DP) -> blocking keys (dictionary + MinHash-LSH, salted) ->
candidate-pair self-join -> vectorized pairwise scoring -> connected
components -> entity clusters.

The per-row invariant (BASELINE input_hint): the pipeline never rewrites
`text` — transcripts pass through by reference, and `validate_invariant`
asserts per-turn text equality under stable (conv_id, turn_idx) order.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from fel_spark.operators import blocking, cluster, mentions as M, scoring


@dataclass
class ERResult:
    mentions: DataFrame  # linked mentions incl. cluster_id
    reps: DataFrame  # distinct (span, entity) representatives + cluster_id
    pairs: DataFrame  # scored candidate pairs (representative level)
    edges: DataFrame  # match edges (representative level)
    blocked: DataFrame  # mention x block_key (for labeled-pair evaluation)


def run_er(
    transcripts: DataFrame,
    alias_dict: DataFrame,
    entities: DataFrame,
    bc_emb=None,
    threshold: float = scoring.DEFAULT_THRESHOLD,
    max_block: int = blocking.DEFAULT_MAX_BLOCK,
    cand_dict: DataFrame | None = None,
) -> ERResult:
    """transcripts -> linked mentions -> representative dedup -> blocked
    self-join -> pairwise scoring -> connected components -> clusters.

    **Dedup-before-pair** is the load-bearing scale decision: mentions
    collapse to distinct (span, entity) representatives before the pair
    self-join, so a Zipf-hot surface form ("clinton" x 10^8 at corpus scale)
    contributes ONE node to the match graph instead of a quadratic block.
    Identical mentions are matched by definition (they share the rep); this
    is FEL's per-query memoization (`CandidatesInfo.maxScore`,
    `w2v/CentroidEntityContext.java:91-99`) promoted to a plan shape —
    dedup-then-score. Salted block caps remain as the backstop for residual
    skew among *distinct* surfaces, and AQE skew-join handles the shuffle.
    """
    linked = M.link_mentions(
        transcripts, alias_dict, entities, bc_emb=bc_emb, cand_dict=cand_dict
    )
    # EAGER: three consumers (reps, blocked_m, the final fan-out join) plus
    # AQE query-stage jobs each re-plan the DataFrame — a lazy checkpoint is
    # not reliably reused across those jobs (observed 3x recomputation of
    # the corpus-level map stage in the event log).
    linked = linked.localCheckpoint(eager=True)

    # the rep chain is dictionary-scale (distinct (span, entity)) — eager
    # snapshots cost nothing to materialize and pin each stage to ONE
    # evaluation: cap_blocks' size probe and the pair self-join's two sides
    # would otherwise re-evaluate their upstream subtree (incl. the minhash
    # signature agg) per consumer, which measured minutes at low parallelism
    reps = (
        linked.select("span", "entity_id", "entity_key")
        .dropDuplicates(["span", "entity_id"])
        .withColumn(
            "mention_id",
            F.concat_ws("#e", "span", F.col("entity_id").cast("string")),
        )
        .localCheckpoint(eager=True)
    )
    blocked_reps = blocking.cap_blocks(
        blocking.blocking_keys(reps), max_block=max_block
    ).localCheckpoint(eager=True)
    pairs = blocking.candidate_pairs(
        blocked_reps, payload_cols=("span", "entity_id", "entity_key")
    )
    scored = scoring.score_pairs(pairs, bc_emb=bc_emb, threshold=threshold)
    edges = scoring.match_edges(scored)

    # no vertices pass: reps absent from the edge set keep cluster_id =
    # their own rep id via the coalesce below (singleton semantics), which
    # saves recomputing the rep dedup inside the CC vertex set
    rep_cc = cluster.connected_components(edges)
    rep_map = reps.join(rep_cc, reps.mention_id == rep_cc.id, "left").select(
        "span",
        "entity_id",
        F.coalesce("component", "mention_id").alias("cluster_id"),
    )
    # rep_map is dictionary-sized -> broadcast fan-out back to mentions
    clustered = linked.join(F.broadcast(rep_map), ["span", "entity_id"], "left")

    # mention-level block membership (labeled pairs share the blocking key)
    blocked_m = linked.join(
        F.broadcast(blocked_reps.select("block_key", "span", "entity_id")),
        ["span", "entity_id"],
    )
    return ERResult(
        mentions=clustered,
        reps=rep_map,
        pairs=scored,
        edges=edges,
        blocked=blocked_m,
    )


def validate_invariant(input_df: DataFrame, output_df: DataFrame) -> bool:
    """Per-turn text equality under stable (conv_id, turn_idx) ordering."""
    a = input_df.select("conv_id", "turn_idx", F.col("text").alias("text_in"))
    b = output_df.select("conv_id", "turn_idx", F.col("text").alias("text_out"))
    diff = a.join(b, ["conv_id", "turn_idx"], "full").filter(
        ~F.col("text_in").eqNullSafe(F.col("text_out"))
    )
    return diff.count() == 0


# ---------------------------------------------------------------------------
# Evaluation: pairwise F1 vs planted reference clusters (BASELINE metric)
# ---------------------------------------------------------------------------


def make_labeled_pairs(gold: DataFrame, blocked: DataFrame) -> DataFrame:
    """FIXTURES.md §3: every intra-block mention pair with ground truth.

    ``gold`` carries (mention_id, entity_id); block membership comes from the
    pipeline's own blocking keys ("labeled pairs at the same blocking key").
    """
    g = gold.select(
        F.col("mention_id").alias("gid"), F.col("entity_id").alias("gent")
    )
    bm = (
        blocked.select("block_key", "mention_id")
        .join(g, F.col("mention_id") == F.col("gid"))
        .select("block_key", "mention_id", "gent")
    )
    a = bm.select(
        "block_key",
        F.col("mention_id").alias("mention_id_a"),
        F.col("gent").alias("ent_a"),
    )
    b = bm.select(
        "block_key",
        F.col("mention_id").alias("mention_id_b"),
        F.col("gent").alias("ent_b"),
    )
    pairs = (
        a.join(b, "block_key")
        .filter(F.col("mention_id_a") < F.col("mention_id_b"))
        .dropDuplicates(["mention_id_a", "mention_id_b"])
    )
    return pairs.select(
        "mention_id_a",
        "mention_id_b",
        "block_key",
        (F.col("ent_a") == F.col("ent_b")).alias("is_match"),
    )


def pairwise_f1(labeled: DataFrame, clustered_mentions: DataFrame) -> dict:
    """Predicted match = same cluster_id; returns precision/recall/F1."""
    c = clustered_mentions.select("mention_id", "cluster_id")
    j = (
        labeled.join(
            c.withColumnRenamed("mention_id", "mention_id_a").withColumnRenamed(
                "cluster_id", "cl_a"
            ),
            "mention_id_a",
        )
        .join(
            c.withColumnRenamed("mention_id", "mention_id_b").withColumnRenamed(
                "cluster_id", "cl_b"
            ),
            "mention_id_b",
        )
        .withColumn("pred", F.col("cl_a") == F.col("cl_b"))
    )
    agg = j.agg(
        F.sum(F.when(F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
        F.count("*").alias("n"),
    ).collect()[0]
    tp, fp, fn = agg["tp"] or 0, agg["fp"] or 0, agg["fn"] or 0
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "n": agg["n"], "precision": prec, "recall": rec, "f1": f1}
