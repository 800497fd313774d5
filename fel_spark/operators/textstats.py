"""Text analytics for training-data pipelines: language ID, quality scoring,
token counting, fingerprinting. All native column expressions.

These generalize the reference's text utilities (`utils/Normalize.java`,
stopword filtering `FastEntityLinker.java:53-54`) into the document-pipeline
operators a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from fel_spark.functions.text import normalize_fast, normalize_tokens

EN_STOPWORDS = (
    "the a an of and to in on for with at from by about as into over after "
    "is are was were be been has have had it this that these those not no "
    "or but if then than so such can will just"
).split()


def token_count(text_col: str = "text") -> Column:
    return F.size(normalize_tokens(text_col))


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """Sub-word-ish token estimate: word pieces of <=4 chars (a BPE-shaped
    upper bound: ceil(len/4) per word), computed natively."""
    toks = normalize_tokens(text_col)
    return F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("int")
    )


def stopword_ratio(text_col: str = "text", stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = normalize_tokens(text_col)
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text_col: str = "text") -> Column:
    stripped = F.regexp_replace(F.col(text_col), r"[^\p{L}\p{N}\s]", "")
    return (F.length(text_col) - F.length(stripped)) / F.greatest(
        F.length(text_col), F.lit(1)
    )


def mean_word_len(text_col: str = "text") -> Column:
    toks = normalize_tokens(text_col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text_col: str = "text") -> Column:
    """Composite [0,1] quality heuristic: penalize extreme length, high
    punctuation, low stopword share, and degenerate word lengths —
    the standard cheap pre-filter before expensive model scoring."""
    n_tok = token_count(text_col)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), 1.0).otherwise(0.3)
    sw = stopword_ratio(text_col)
    sw_ok = F.when(sw >= 0.05, 1.0).otherwise(sw / 0.05)
    punct_ok = F.when(punct_ratio(text_col) <= 0.2, 1.0).otherwise(0.5)
    mwl = mean_word_len(text_col)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.5)
    return (len_ok * sw_ok * punct_ok * mwl_ok).alias("quality")


def language_id(text_col: str = "text") -> Column:
    """Cheap n-gram/stopword language heuristic -> 'en' | 'other'.

    (The container has no langid model; the heuristic is the deterministic
    stand-in with the same operator shape: per-row scoring, no shuffle.)
    """
    return F.when(stopword_ratio(text_col) >= 0.05, "en").otherwise("other")


def fingerprint(text_col: str = "text") -> Column:
    """Deterministic 128-bit content fingerprint of normalized text."""
    return F.md5(normalize_fast(text_col))


def rolling_fingerprints(text_col: str = "text", window: int = 5) -> Column:
    """Rolling window fingerprints: xxhash64 of each ``window``-token
    shingle — the building block for containment/overlap detection."""
    from fel_spark.functions.text import token_ngrams

    toks = normalize_tokens(text_col)
    return F.transform(token_ngrams(toks, window), lambda g: F.xxhash64(g))


def doc_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass per-document stats table."""
    return docs.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_subwords"),
        F.length(text_col).alias("n_chars"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(mean_word_len(text_col), 6).alias("mean_word_len"),
        F.round(quality_score(text_col), 6).alias("quality"),
        language_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )
