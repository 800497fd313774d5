"""Pairwise match scoring over candidate pairs.

The feature set mirrors the reference's similarity kernels (north_star
mapping in SURVEY.md §0):

- Jaro-Winkler           ~ FEL lexical similarity (oracle-parity impl)
- token-set Jaccard      ~ context token overlap
- char-bigram Dice       = `CompressedSingleFileEntitySimilarityUtil.java:147-164`
- entity-embedding cosine = FEL's entity2EntitySimilarity (`:40-47`)
- same resolved entity   = FEL's core semantics: two mentions match when the
  linker assigns them the same entity (CoherentEntityLinker's goal —
  a coherent assignment per document, `CoherentEntityLinker.java:152-255`).

Everything except Jaro-Winkler is native column arithmetic; JW is an
Arrow-batched pandas UDF. A two-phase shape keeps the expensive UDF off
pairs already decided by cheap features (W5's dynamic-pruning analogue).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from fel_spark.functions.sim import array_jaccard, bigram_dice, jaro_winkler_pudf
from fel_spark.functions.text import char_bigrams

# decision weights: same-entity dominates (FEL semantics); lexical+embedding
# evidence can also carry a pair over the threshold on its own when strong.
DEFAULT_THRESHOLD = 0.75


def pair_features(pairs: DataFrame, bc_emb=None) -> DataFrame:
    """Attach similarity features to (span_a, span_b, entity_*_a/b) pairs."""
    toks_a = F.split(F.col("span_a"), " ")
    toks_b = F.split(F.col("span_b"), " ")
    out = (
        # materialize the bigram arrays: bigram_dice's multiset branch
        # references its inputs per aggregate element, so feeding it the
        # char_bigrams expression would rebuild the array per element
        pairs.withColumn("_bg_a", char_bigrams(F.col("span_a")))
        .withColumn("_bg_b", char_bigrams(F.col("span_b")))
        .withColumn("jaccard", array_jaccard(toks_a, toks_b))
        .withColumn("dice", bigram_dice(F.col("_bg_a"), F.col("_bg_b")))
        .drop("_bg_a", "_bg_b")
        .withColumn(
            "same_entity", (F.col("entity_id_a") == F.col("entity_id_b")).cast("double")
        )
    )
    # phase 1 cheap decision; Jaro-Winkler (pandas UDF) only where the cheap
    # features leave the pair undecided.
    decided = (out.jaccard >= 0.99) | (out.same_entity >= 1.0) | (out.dice < 0.05)
    out = out.withColumn(
        "jw",
        F.when(decided, F.lit(None).cast("double")).otherwise(
            jaro_winkler_pudf(F.col("span_a"), F.col("span_b"))
        ),
    )
    if bc_emb is not None:
        from fel_spark.operators.context import entity_entity_cosine

        out = entity_entity_cosine(out, bc_emb, "entity_key_a", "entity_key_b")
    else:
        out = out.withColumn("entity_cosine", F.lit(0.0))
    return out


def match_score() -> Column:
    """Blend: same-entity is decisive; otherwise a convex mix of lexical and
    embedding evidence (lambda_lex=0.5 mirrors the coherence lattice's
    lexical/embedding blend, `CoherentEntityLinker.java:46-70`)."""
    lex = F.greatest(F.coalesce(F.col("jw"), F.lit(0.0)), F.col("dice"), F.col("jaccard"))
    emb = F.greatest(F.col("entity_cosine"), F.lit(0.0))
    blended = 0.5 * lex + 0.5 * emb
    return F.when(F.col("same_entity") >= 1.0, F.lit(1.0)).otherwise(blended)


def score_pairs(
    pairs: DataFrame, bc_emb=None, threshold: float = DEFAULT_THRESHOLD
) -> DataFrame:
    feats = pair_features(pairs, bc_emb)
    return feats.withColumn("match_score", match_score()).withColumn(
        "is_match", (F.col("match_score") >= threshold)
    )


def match_edges(scored_pairs: DataFrame) -> DataFrame:
    """(src, dst) edges for transitive clustering."""
    return scored_pairs.filter("is_match").select(
        F.col("mention_id_a").alias("src"), F.col("mention_id_b").alias("dst")
    )
