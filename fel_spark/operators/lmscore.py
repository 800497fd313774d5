"""Character n-gram LM perplexity scoring — the CCNet-style quality
signal: score each document by how surprising its text is under a small
language model trained on a reference corpus, then filter/bucket on the
score (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data" — their KenLM 5-gram word model becomes a
character-trigram model here: same signal shape, pure DataFrame ops).

Everything is relational, so the driver value-checks the WHOLE chain —
training counts AND scoring — against a DuckDB replay:

- `char_ngram_counts(docs, n)` — one explode + hash aggregate over the
  corpus: ((n-1)-char context, next char) counts. The model IS a
  DataFrame (dictionary-scale: <= alphabet^n rows), broadcast into the
  scoring join.
- `doc_lm_scores(docs, model)` — explode each doc's n-grams, broadcast-
  join the model, additive-smoothed -log2 p(char | context) averaged per
  doc (= log2 perplexity), rounded to 4dp for cross-engine stability.
  Out-of-vocabulary contexts fall back to the smoothed uniform floor.

Normalization matches `normalize_fast` (lower + non-alnum -> space +
squeeze) with '^' padding so every document contributes exactly
len(text)+1 transition events and the first real characters are scored
against start-of-text contexts.

Scale: training is one shuffle at alphabet^n keys (bounded, tiny);
scoring shuffles nothing but the model broadcast — the corpus-side work
is map-side explode + join + per-doc partial agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fel_spark.functions.text import normalize_fast


def _padded(text_col: str, n: int):
    # '^' never appears in normalize_fast output -> unambiguous padding
    return F.concat(F.lit("^" * (n - 1)), normalize_fast(text_col))


def _ngrams(text_col: str, n: int):
    """All n-char windows of the padded normalized text as an array."""
    s = _padded(text_col, n)
    # guard: sequence(1, 0) in Spark INFERS step -1 and yields [1, 0] —
    # an empty normalized text must produce zero n-grams, not two bogus
    # ones
    return F.when(
        F.length(s) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - (n - 1)),
            lambda i: s.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngram_counts(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """-> (ctx, nxt, cnt): counts of (n-1-char context, following char)
    over the normalized corpus. One explode + one hash aggregate."""
    if n < 2:
        raise ValueError("n must be >= 2")
    g = docs.select(F.explode(_ngrams(text_col, n)).alias("g"))
    return g.select(
        F.substring("g", 1, n - 1).alias("ctx"),
        F.substring("g", n, 1).alias("nxt"),
    ).groupBy("ctx", "nxt").agg(F.count("*").cast("long").alias("cnt"))


def doc_lm_scores(
    docs: DataFrame,
    model: DataFrame,
    n: int = 3,
    alpha: float = 1.0,
    vocab_size: int = 37,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_events, logppl_4dp): additive-smoothed per-char
    -log2 p(nxt | ctx) averaged over the doc's transition events, x10000
    rounded to a BIGINT (cross-engine-stable fixed point).

    p = (cnt + alpha) / (ctx_total + alpha * vocab_size); unseen
    (ctx, nxt) under a seen ctx smooths to alpha / (...); a wholly
    unseen ctx scores the uniform floor 1 / vocab_size. ``vocab_size``
    defaults to normalize_fast's alphabet (26 + 10 + space) + ^ pad.
    """
    ctx_totals = model.groupBy("ctx").agg(F.sum("cnt").alias("ctx_total"))
    m = model.select("ctx", "nxt", "cnt")
    ev = docs.select(
        F.col(id_col), F.explode(_ngrams(text_col, n)).alias("g")
    ).select(
        id_col,
        F.substring("g", 1, n - 1).alias("ctx"),
        F.substring("g", n, 1).alias("nxt"),
    )
    joined = ev.join(F.broadcast(m), ["ctx", "nxt"], "left").join(
        F.broadcast(ctx_totals), ["ctx"], "left"
    )
    p = (
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("ctx_total"), F.lit(0)) + F.lit(alpha * vocab_size))
    )
    neglog2 = -F.log2(p)
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.avg(neglog2).alias("_avg"),
        )
        .select(
            id_col,
            "n_events",
            F.round(F.col("_avg") * 10000).cast("long").alias("logppl_4dp"),
        )
    )
