"""TF-IDF keyword extraction: per-document top-k terms by tf·idf.

The training-data-pipeline use: cheap corpus-statistical keywords for
routing, domain tagging, and duplicate triage — the same one-pass shape as
the reference's corpus-frequency mining (`hash/CountNGramsFromQueries.java`
counts n-grams once and reuses the table everywhere).

100 TB shape: ONE explode + hash aggregation produces the (doc, word, tf)
table; the document-frequency table re-aggregates it (vocabulary-scale —
deliberately NOT broadcast-hinted: a 100 TB corpus's vocabulary does not
fit on the driver, so the join is left to AQE, which broadcasts when the
runtime size allows and shuffle-joins otherwise); the corpus size is a
1-row aggregate crossed in (the A5/J4 pattern). Top-k per doc is one
window over doc_id (plans as partial+final WindowGroupLimit, so each
shuffle side keeps only k rows per doc). No Python anywhere — the whole
plan is codegen column math.

Two deliberate shape choices: (1) df-by-window (`count().over(
partitionBy(word))`) would avoid re-deriving tf for the join, but a
window partition cannot be skew-split and stopwords appear in nearly
every document — the join form lets AQE's skew-join handle hot words.
(2) Catalyst therefore scans the corpus twice (once per tf lineage); a
production pipeline run persists the (doc, word, tf) table between the
two uses — pass that materialized frame as ``df``'s upstream or snapshot
via plans/metrics.StageRunner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fel_spark.functions.text import normalize_tokens

__all__ = ["tfidf_topk"]


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` terms per document by smooth TF-IDF.

    score = tf · (ln((N + 1) / (df + 1)) + 1)   (sklearn's smooth_idf),
    ties broken deterministically by word ASC. Documents with no tokens
    contribute no rows. Returns (id_col, word, tf, score, rnk).
    """
    tf = (
        df.select(id_col, F.explode(normalize_tokens(text_col)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = df.agg(F.count("*").alias("n_docs"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("word").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(k))
        .select(id_col, "word", "tf", "score", "rnk")
    )
