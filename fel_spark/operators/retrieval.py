"""BM25 retrieval scoring — relational end to end.

Okapi BM25 (Robertson/Sparck Jones weighting with the Lucene-style
always-positive idf) as plain DataFrame algebra: term-frequency hash
aggregate, document-frequency aggregate, a 1-row corpus-stats cross
join (N, avgdl), a broadcast join against the query terms, and a
per-query top-k window. No UDF anywhere; every step replays in SQL, so
the driver value-checks scores AND ranking.

score(q, d) = sum over query terms t of
    idf(t) * tf(t, d) * (k1 + 1) / (tf(t, d) + k1 * (1 - b + b * |d|/avgdl))
idf(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

Ranking uses the ENGINE-NEUTRAL key (score_4dp DESC, doc_id ASC): ranks
are computed on the rounded fixed-point score, never on raw doubles, so
two engines cannot order near-equal scores differently (the
conv_integrity lesson applied at design time).

Scale: the only corpus-sized shuffles are the tf aggregate and the
final per-query window (query-keyed, tiny); df and corpus stats are
dictionary-scale; the query-term join is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fel_spark.operators.textstats import normalize_tokens


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int = 5,
    k_const: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of N ranked
    retrieval lists: rrf(q, d) = sum over lists containing d of
    1 / (k_const + rank). Hybrid lexical+dense retrieval is the standard
    use — fuse :func:`bm25_topk` with an embedding-cosine top-k.

    Relational end to end: union the lists, one (query, doc) aggregate,
    one per-query window. The per-list reciprocal is an IEEE division of
    integers (exact-rounded, engine-identical); the fused score is a sum
    of at most len(ranked_lists) such terms, rounded to micro units at
    the END for the engine-neutral rank key (rrf_micro DESC, doc_id ASC).

    Scale: input lists are already top-k per query (tiny per query), so
    every shuffle here is query-keyed and bounded by k * n_lists rows
    per query — nothing corpus-sized.
    """
    u = None
    for r in ranked_lists:
        part = r.select(
            query_col,
            id_col,
            (F.lit(1.0) / (F.lit(float(k_const)) + F.col(rank_col))).alias(
                "_rr"
            ),
        )
        u = part if u is None else u.unionByName(part)
    fused = u.groupBy(query_col, id_col).agg(
        F.round(F.sum("_rr") * 1000000).cast("long").alias("rrf_micro"),
        F.count("*").cast("int").alias("n_lists"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_micro").desc(), F.col(id_col).asc()
    )
    return fused.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``query_terms``: (query_id, term) — multi-term queries are rows
    sharing a query_id. -> (query_id, doc_id, score_4dp, rank) with the
    top ``k`` documents per query under the neutral rank key."""
    toks = docs.select(
        F.col(id_col), F.explode(normalize_tokens(text_col)).alias("term")
    )
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(query_terms), "term")
        .join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfn = (
        F.col("tf")
        * (k1 + 1)
        / (
            F.col("tf")
            + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    per_query = scored.groupBy("query_id", id_col).agg(
        F.sum(idf * tfn).alias("_score")
    )
    with4 = per_query.select(
        "query_id",
        id_col,
        F.round(F.col("_score") * 10000).cast("long").alias("score_4dp"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_4dp").desc(), F.col(id_col).asc()
    )
    return (
        with4.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
