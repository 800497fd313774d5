"""Synthetic corpus: determinism across parallelism, schema, gold alignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from fel_spark.sources.synth import (
    alias_dict_df,
    embeddings_df,
    gold_mentions,
    synth_transcripts_df,
    transcripts,
)
from fel_spark.functions.text import normalize_tokens


def test_schema_and_counts(spark, tiny_corpus):
    t = transcripts(tiny_corpus)
    assert [f.name for f in t.schema.fields] == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]
    assert t.count() == 150 * 6
    roles = {r[0] for r in t.select("role").distinct().collect()}
    assert roles <= {"user", "assistant", "tool"}


def test_determinism_across_partitioning(spark, dict_pack):
    a = synth_transcripts_df(spark, dict_pack, n_conv=40, turns_per_conv=5, num_partitions=2)
    b = synth_transcripts_df(spark, dict_pack, n_conv=40, turns_per_conv=5, num_partitions=13)
    ta = transcripts(a).orderBy("conv_id", "turn_idx").collect()
    tb = transcripts(b).orderBy("conv_id", "turn_idx").collect()
    assert ta == tb


def test_gold_mentions_align_with_text(spark, tiny_corpus, dict_pack):
    """Every gold mention's alias tokens appear at its token_start (1-based)."""
    g = gold_mentions(tiny_corpus)
    joined = g.join(
        tiny_corpus.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
    ).withColumn("toks", normalize_tokens("text"))
    bad = joined.filter(
        F.array_join(
            F.slice("toks", F.col("token_start"), F.size(F.split(F.col("alias"), " "))),
            " ",
        )
        != F.col("alias")
    )
    assert bad.count() == 0


def test_alias_dict_and_embeddings(spark, dict_pack):
    ad = alias_dict_df(spark, dict_pack)
    assert ad.filter("QAEF <= 0 or QAF <= 0").count() == 0
    # every planted alias resolvable
    n_alias = ad.select("alias").distinct().count()
    assert n_alias >= dict_pack.n_entities  # at least one alias per entity
    emb = embeddings_df(spark, dict_pack)
    row = emb.first()
    assert len(row["vec"]) == 32
