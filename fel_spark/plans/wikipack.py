"""Wikipedia-dump -> datapack assembly (the mine-datapack.sh end-to-end).

Closes the loop between the S3 dump reader (`sources/wikixml.py`) and the
alias-dictionary build (`plans/dictionary.py`), re-expressing the
reference's offline assembly:

- anchor extraction + redirect-resolved targets
  (`io/ExtractWikipediaAnchorText.java:150-302` — tasks 1-2 of
  `bash/mine-datapack.sh:18-236`)
- per-anchor counting (A9, `ExtractWikipediaAnchorText.java:358-460`)
- corpus frequency of every anchor phrase in article text (the bounded
  15-token n-gram scan, `ExtractWikipediaAnchorText.java:322-445`)
- the Datapack merge of anchor counts with corpus frequencies
  (`io/Datapack.java:98-213` — a sort-merge co-iteration of two MapFiles,
  here a plain dictionary-scale join)
- the Pig aggregate/compute/join chain (`plans/dictionary.build_alias_dict`)

Spark-first shape: the dump parse is one mapInPandas pass, anchors are
native column expressions, the redirect closure is pointer-jumping, the
phrase scan is a bounded span explode joined against the (dictionary-scale,
broadcast) anchor vocabulary, and every count lands in ONE hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fel_spark.functions.text import all_spans, normalize_fast
from fel_spark.sources.wikixml import extract_anchors, read_wikipedia_pages

MAX_PHRASE_TOKENS = 15  # the reference's n-gram scan bound (:322-445)

# Broadcast gate for the anchor vocabulary (the TF-IDF lesson, commit
# 0e0424b: vocabulary-scale != broadcast-safe — an unconditional hint
# OOMs the driver when the dictionary outgrows the executors). FEL's own
# datapack posture is the bound: the reference ships its whole alias
# dictionary to every node as a <=3 GB distributed-cache artifact
# (README.md:10, io/Datapack.java) — full enwiki is ~16M aliases /
# ~0.5-1 GB, comfortably inside. Above the bound we drop the hint and
# let AQE pick the join from runtime stats.
WIKIPACK_BROADCAST_MAX_BYTES = 3 << 30


def vocab_broadcastable(
    phrases: DataFrame, max_bytes: int = WIKIPACK_BROADCAST_MAX_BYTES
) -> bool:
    """One dictionary-scale agg job: estimate the broadcast footprint of
    the alias vocabulary (rows x per-row hashed-relation estimate, 2x
    safety) and compare against the datapack bound. Callers should pass a
    SNAPSHOTTED (checkpointed) frame — estimating an unmaterialized
    corpus-derived vocabulary would re-run the corpus scan."""
    row = phrases.agg(
        F.count("*").alias("n"),
        F.avg(F.length("alias")).alias("avg_len"),
    ).collect()[0]
    n, avg_len = row["n"] or 0, row["avg_len"] or 0.0
    est = n * (avg_len * 2 + 48) * 2
    return est <= max_bytes


def wiki_observations(pages: DataFrame) -> DataFrame:
    """Anchors as alias-dictionary observations.

    -> (alias, entity_name, clicked, from_query): one row per [[..]] link
    occurrence, redirect-resolved, title-filtered (see
    `wikixml.extract_anchors`). Anchor-space rows are corpus-side
    (from_query=False); ``clicked`` is True — every anchor IS a link (the
    LAF/LAET event). Query-space counts (QAT/QAF) come from query logs the
    dump does not carry, exactly as in the reference (search counts are
    hard-coded 0L in `pig/join-alias-entity-counts.pig:97-98` with the
    schema anticipating a later UNION of sources).
    """
    return extract_anchors(pages, resolve=True).select(
        F.col("anchor").alias("alias"),
        F.col("target_title").alias("entity_name"),
        F.lit(True).alias("clicked"),
        F.lit(False).alias("from_query"),
    )


def corpus_phrase_counts(
    pages: DataFrame,
    phrases: DataFrame,
    max_n: int = MAX_PHRASE_TOKENS,
    broadcast_vocab: bool | None = None,
) -> DataFrame:
    """Occurrences of each anchor phrase in article text (link or not) —
    the reference's corpus-frequency MapFile
    (`ExtractWikipediaAnchorText.java:322-445`: every <=15-token window of
    every article, counted when it matches an anchor in the vocabulary).

    -> (alias, n_corpus). Plan: visible link text replaces markup
    ([[t|a]] -> a, [[t]] -> t), normalizeFast tokenization, bounded span
    explode (L1 shape), semi-join against the dictionary-scale phrase
    vocabulary, ONE hash aggregate. The explode is bounded by ``max_n`` x
    tokens — corpus-linear, never quadratic.

    The vocabulary join is broadcast-hinted only when the vocabulary fits
    FEL's datapack bound (``broadcast_vocab=None`` runs the
    `vocab_broadcastable` size gate; pass True/False to force). Gated
    broadcast keeps the corpus span stream shuffle-free at dictionary
    scale; past the bound the hint is dropped and AQE picks the join.
    """
    text = F.regexp_replace("markup", r"\[\[(?:[^\[\]\|]*\|)?([^\[\]]*)\]\]", r"$1")
    toks = F.split(normalize_fast(text), " ")
    spans = (
        pages.filter((F.col("ns") == 0) & F.col("redirect").isNull())
        .select(F.explode(all_spans(toks, max_n)).alias("_sp"))
        .select(F.col("_sp.span").alias("alias"))
    )
    vocab = phrases.select("alias").distinct()
    if broadcast_vocab is None:
        broadcast_vocab = vocab_broadcastable(vocab)
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    return (
        spans.join(vocab, "alias")
        .groupBy("alias")
        .agg(F.count("*").alias("n_corpus"))
    )


def build_wikipack(
    spark: SparkSession,
    dump_path: str,
    corpus_counts: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """dump file(s) -> (alias_dict, entity_names): the full datapack build.

    ``alias_dict`` has the FIXTURES.md §2 schema (`build_alias_dict`
    output); when ``corpus_counts`` is set, LAT is replaced by the
    article-text phrase frequency (the Datapack merge semantics: LAF =
    times the phrase occurs AS a link, LAT = times it occurs in the corpus
    at all, so LAF <= LAT and the link-probability prior LAF/LAT is
    meaningful — `io/Datapack.java:128-213`).
    """
    from fel_spark.plans.dictionary import build_alias_dict

    pages = read_wikipedia_pages(spark, dump_path)
    # two consumers (anchor extraction + phrase scan) — snapshot the parse
    pages = pages.localCheckpoint(eager=True)
    ad, names = build_alias_dict(wiki_observations(pages))
    if corpus_counts:
        # two consumers of ad (phrase-scan vocabulary + final LAT join),
        # and the broadcast gate needs a cheap count — snapshot it so the
        # size estimate and the reuse never re-run the dictionary build
        ad = ad.localCheckpoint(eager=True)
        bc_ok = vocab_broadcastable(ad.select("alias"))
        cc = corpus_phrase_counts(
            pages, ad.select("alias"), broadcast_vocab=bc_ok
        )
        # cc is keyed by (a subset of) the gated vocabulary, so the same
        # decision applies: hint only when the vocabulary passed the gate
        cc_side = F.broadcast(cc) if bc_ok else cc
        ad = (
            ad.join(cc_side, "alias", "left")
            .withColumn("LAT", F.greatest(F.coalesce("n_corpus", F.lit(0)), F.col("LAF")))
            .drop("n_corpus")
        )
    return ad, names


def wiki_entities(entity_names: DataFrame) -> DataFrame:
    """entity_names -> the (entity_id, name, type) dimension expected by
    `operators.mentions.link_mentions` (type: the dump carries none —
    smallint 0, the reference's untyped default)."""
    return entity_names.select(
        "entity_id", "name", F.lit(0).cast("smallint").alias("type")
    )
