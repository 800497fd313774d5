"""Corpus filtering: one keep/drop decision per document with audit flags.

Composes the cheap per-document signals (length, Gopher repetition shares,
stopword share, language ID) into a single map-only pass — the standard
pre-training filter stage that runs BEFORE any expensive dedup or model
scoring. Every rule emits its own 0/1 flag so a 100 TB run can account for
exactly why each fraction of the corpus was dropped (sum the flags, log
next to lineage metrics) instead of reporting one opaque keep rate.

Thresholds on the ratio signals compare the same floor() integer digests
the oracled signal queries emit (`*_4dp`), so decisions are integer-exact
and engine-independent; no float boundary ambiguity.

Plan shape: everything is row-local column arithmetic over one scan — no
exchange, no UDF. Language ID accepts the same optional broadcast model as
`textstats.language_id`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from fel_spark.functions.text import normalize_tokens
from fel_spark.operators.textstats import (
    dup_bigram_4dp_expr,
    language_id,
    stopword_4dp_expr,
    top_word_4dp_expr,
)


def corpus_filter_decisions(
    docs: DataFrame,
    min_words: int = 20,
    max_words: int = 2000,
    max_top_word_4dp: int = 2000,
    max_dup_bigram_4dp: int = 3000,
    min_stopword_4dp: int = 100,
    langs: tuple[str, ...] = ("en",),
    id_col: str = "doc_id",
    text_col: str = "text",
    bc_lang_model=None,
) -> DataFrame:
    """-> (id, n_words, f_short, f_long, f_top_word, f_dup_bigram,
    f_low_stopword, f_lang, keep).

    ``keep`` is true iff every flag is 0. Defaults follow the published
    filter stacks (Gopher / C4): 0.20 top-word share, 0.30 duplicate-bigram
    share, 0.01 stopword floor, 20..2000 words, English only.
    """
    d = docs.select(
        F.col(id_col),
        normalize_tokens(text_col).alias("toks"),
        language_id(text_col, bc_model=bc_lang_model).alias("lang_pred"),
    )
    toks = F.col("toks")
    n = F.size(toks)
    # the shared textstats digest expressions — one definition for the
    # oracled signal queries and these thresholds, so they cannot drift
    top4 = top_word_4dp_expr(toks)
    dup4 = dup_bigram_4dp_expr(toks)
    sw4 = stopword_4dp_expr(toks)

    def flag(cond: Column) -> Column:
        return F.when(cond, 1).otherwise(0).cast("int")

    out = d.select(
        F.col(id_col),
        n.alias("n_words"),
        flag(n < min_words).alias("f_short"),
        flag(n > max_words).alias("f_long"),
        flag(top4 > max_top_word_4dp).alias("f_top_word"),
        flag(dup4 > max_dup_bigram_4dp).alias("f_dup_bigram"),
        flag(sw4 < min_stopword_4dp).alias("f_low_stopword"),
        flag(~F.col("lang_pred").isin(*langs)).alias("f_lang"),
    )
    total = (
        F.col("f_short")
        + F.col("f_long")
        + F.col("f_top_word")
        + F.col("f_dup_bigram")
        + F.col("f_low_stopword")
        + F.col("f_lang")
    )
    return out.withColumn("keep", total == 0)


def filter_corpus(docs: DataFrame, id_col: str = "doc_id", **thresholds) -> DataFrame:
    """Apply :func:`corpus_filter_decisions` and return only kept docs
    (original columns). The decision join is on the id — at scale the
    decision frame is a projection of the same scan, so Catalyst collapses
    this to one pass when ``docs`` is a direct source read."""
    keep = corpus_filter_decisions(docs, id_col=id_col, **thresholds).filter(
        F.col("keep")
    )
    return docs.join(keep.select(id_col), id_col, "left_semi")


def filter_audit(decisions: DataFrame) -> DataFrame:
    """One-row drop accounting: corpus size, kept count, and per-rule flag
    totals — the audit row a production run logs per partition/stage."""
    return decisions.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("int")).alias("n_kept"),
        F.sum("f_short").alias("n_short"),
        F.sum("f_long").alias("n_long"),
        F.sum("f_top_word").alias("n_top_word"),
        F.sum("f_dup_bigram").alias("n_dup_bigram"),
        F.sum("f_low_stopword").alias("n_low_stopword"),
        F.sum("f_lang").alias("n_lang"),
    )
