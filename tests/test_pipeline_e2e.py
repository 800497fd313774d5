"""End-to-end ER: pairwise F1 >= 0.99 vs planted clusters (BASELINE metric),
exact mention extraction, per-turn text-equality invariant, and the
coherence fixture semantics (same-surface mentions cluster together)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fel_spark.operators.context import EmbeddingMatrix, broadcast_embeddings
from fel_spark.plans.pipeline import (
    make_labeled_pairs,
    pairwise_f1,
    run_er,
    validate_invariant,
)
from fel_spark.sources.synth import (
    alias_dict_df,
    embeddings_df,
    entities_df,
    gold_mentions,
    transcripts,
)


@pytest.fixture(scope="module")
def er_result(spark, dict_pack, tiny_corpus):
    t = transcripts(tiny_corpus)
    ad = alias_dict_df(spark, dict_pack)
    ents = entities_df(spark, dict_pack)
    bc = broadcast_embeddings(
        spark, EmbeddingMatrix.from_spark(embeddings_df(spark, dict_pack))
    )
    res = run_er(t, ad, ents, bc_emb=bc)
    res.mentions.cache().count()
    return res


def test_mention_extraction_exact(spark, tiny_corpus, er_result):
    g = gold_mentions(tiny_corpus)
    linked = er_result.mentions
    assert linked.count() == g.count()
    joined = linked.join(
        g.select(
            "conv_id",
            "turn_idx",
            F.col("token_start").alias("start"),
            F.col("entity_id").alias("gold_ent"),
        ),
        ["conv_id", "turn_idx", "start"],
        "inner",
    )
    assert joined.count() == g.count()  # every mention at a gold position
    wrong = joined.filter(F.col("entity_id") != F.col("gold_ent")).count()
    assert wrong / g.count() <= 0.005


def test_pairwise_f1_target(spark, tiny_corpus, er_result):
    g = gold_mentions(tiny_corpus)
    lp = make_labeled_pairs(g, er_result.blocked)
    m = pairwise_f1(lp, er_result.mentions)
    assert m["n"] > 10_000
    assert m["f1"] >= 0.99, m


def test_text_invariant(spark, tiny_corpus):
    t = transcripts(tiny_corpus)
    assert validate_invariant(t, t)


def test_coherence_fixture(spark, dict_pack, tiny_corpus, er_result):
    """FEL's canonical coherence expectation (test.txt / FIXTURES.md §5):
    mentions with the same surface in similar contexts land in one cluster."""
    m = er_result.mentions
    # take the most frequent (entity, span): all its mentions must share a cluster
    top = (
        m.groupBy("entity_id", "span")
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    clusters = (
        m.filter((F.col("entity_id") == top["entity_id"]) & (F.col("span") == top["span"]))
        .select("cluster_id")
        .distinct()
        .count()
    )
    assert clusters == 1
