"""Text analytics for training-data pipelines: language ID, quality scoring,
token counting, fingerprinting. All native column expressions.

These generalize the reference's text utilities (`utils/Normalize.java`,
stopword filtering `FastEntityLinker.java:53-54`) into the document-pipeline
operators a 100 TB corpus needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

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


class LangIdModel:
    """Broadcast-able token -> per-language weight table (the fastText-style
    hook: a real model drops in as {lang: {token: weight}} without changing
    the operator). Lookup structures are plain pandas/NumPy so scoring stays
    one get_indexer probe + one scatter-add per Arrow batch."""

    def __init__(self, lang_token_weights: dict[str, dict[str, float]]):
        self.langs = sorted(lang_token_weights)
        vocab: dict[str, int] = {}
        for tw in lang_token_weights.values():
            for t in tw:
                vocab.setdefault(t, len(vocab))
        self.token_index = pd.Index(list(vocab))
        self.weights = np.zeros((max(len(vocab), 1), len(self.langs)))
        # presence distinguishes "token in this language's table (weight may
        # be 0 or negative)" from "absent": the argmax is restricted to
        # languages with >= 1 vocabulary hit, so a no-hit language's 0.0 sum
        # can never beat a negative-scored language that DID hit
        self.presence = np.zeros_like(self.weights)
        for li, lang in enumerate(self.langs):
            for t, w in lang_token_weights[lang].items():
                self.weights[vocab[t], li] = w
                self.presence[vocab[t], li] = 1.0


def language_id(
    text_col: str = "text", bc_model=None, default_lang: str = "other"
) -> Column:
    """Language ID over normalized tokens.

    Default (no model): cheap stopword-share heuristic -> 'en' | 'other' —
    the deterministic container stand-in, same operator shape as a
    model-backed scorer (per-row, no shuffle). With ``bc_model`` (a
    broadcast :class:`LangIdModel`): vectorized token-weight voting — sum
    each language's token weights per document, argmax; documents with no
    vocabulary hits fall back to ``default_lang``. The heuristic is no
    longer load-bearing once a real model table is supplied.
    """
    if bc_model is None:
        return F.when(stopword_ratio(text_col) >= 0.05, "en").otherwise("other")

    @F.pandas_udf("string")
    def _lid(toks: pd.Series) -> pd.Series:
        model = bc_model.value
        n = len(toks)
        ex = toks.reset_index(drop=True).explode().dropna()
        rows = ex.index.to_numpy(np.int64)
        pos = model.token_index.get_indexer(pd.Index(ex.to_numpy(dtype=object)))
        ok = pos >= 0
        scores = np.zeros((n, len(model.langs)))
        np.add.at(scores, rows[ok], model.weights[pos[ok]])
        # per-language hit counts: the argmax runs over hit languages only
        # (a fastText-style table may carry negative/zero weights — a
        # language the document never touched must not win on its 0.0 sum),
        # and a document with zero hits anywhere falls back to default_lang
        lang_hits = np.zeros((n, len(model.langs)))
        np.add.at(lang_hits, rows[ok], model.presence[pos[ok]])
        masked = np.where(lang_hits > 0, scores, -np.inf)
        langs = np.asarray(model.langs, dtype=object)
        out = np.where(
            lang_hits.sum(axis=1) > 0, langs[masked.argmax(axis=1)], default_lang
        )
        return pd.Series(out, index=toks.index, dtype=object)

    return _lid(normalize_tokens(text_col))


class QualityModel:
    """Broadcast-able token -> weight linear quality classifier (the
    fastText/CCNet-style hook: a trained wiki-ref model drops in as
    {token: weight} + bias without changing the operator). Same lookup
    shape as :class:`LangIdModel`: one get_indexer probe + one
    scatter-add per Arrow batch."""

    def __init__(self, token_weights: dict[str, float], bias: float = 0.0):
        self.token_index = pd.Index(list(token_weights))
        self.weights = np.asarray(list(token_weights.values()), dtype=np.float64)
        self.bias = float(bias)


def quality_model_score(
    text_col: str = "text", bc_model=None, raw: bool = False
) -> Column:
    """Model-backed document quality score.

    Default (no model): the :func:`quality_score` heuristic — same
    operator shape, so the heuristic is not load-bearing once a trained
    model table is supplied. With ``bc_model`` (a broadcast
    :class:`QualityModel`): fastText-style linear scoring — mean token
    weight over ALL tokens (OOV contribute 0 to the sum but count in the
    denominator, matching fastText's averaged bag-of-words) plus bias,
    squashed by a sigmoid. ``raw=True`` returns the pre-sigmoid log-odds
    (pure +-*/ arithmetic — with dyadic-rational weights the value is
    bit-exact and engine-independent, which is what the driver oracle
    digests)."""
    if bc_model is None:
        return quality_score(text_col)

    @F.pandas_udf("double")
    def _q(toks: pd.Series) -> pd.Series:
        model = bc_model.value
        n = len(toks)
        ex = toks.reset_index(drop=True).explode().dropna()
        rows = ex.index.to_numpy(np.int64)
        pos = model.token_index.get_indexer(pd.Index(ex.to_numpy(dtype=object)))
        ok = pos >= 0
        s = np.zeros(n)
        c = np.zeros(n)
        np.add.at(s, rows[ok], model.weights[pos[ok]])
        np.add.at(c, rows, 1.0)
        z = model.bias + s / np.maximum(c, 1.0)
        out = z if raw else 1.0 / (1.0 + np.exp(-z))
        return pd.Series(out, index=toks.index)

    return _q(normalize_tokens(text_col))


def top_token_count(tokens: Column) -> Column:
    """Occurrence count of the most frequent token, computed row-local:
    array_sort + a run-length fold (one `aggregate` HOF). Zero shuffle —
    the per-doc repetition signal never leaves the scan stage, which is
    the only shape that survives a 100 TB corpus (an explode+groupBy
    formulation shuffles every token)."""
    s = F.array_sort(tokens)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best"),
    )

    def step(acc: Column, t: Column) -> Column:
        run = F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            t.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(s, zero, step, lambda acc: acc["best"])


def word_bigrams(tokens: Column) -> Column:
    """Adjacent-token bigrams (space-joined) of a token array — row-local.
    Same zip_with-of-shifted-slices shape as token_ngrams (no per-element
    re-evaluation of the input when given an expression). NULL in -> NULL
    out (token_ngrams maps NULL to []; the doc_repetition digest needs
    NULL to stay NULL to match the DuckDB oracle replay). Pass a
    MATERIALIZED column: the NULL guard plus token_ngrams reference the
    input n+3 times."""
    from fel_spark.functions.text import token_ngrams

    return F.when(tokens.isNotNull(), token_ngrams(tokens, 2))


def top_word_4dp_expr(toks: Column) -> Column:
    """floor(top-word share * 10000) over a token array — the integer
    digest both the doc_repetition oracle and the corpus filter threshold
    compare (single definition: the two must stay integer-identical)."""
    return F.floor(
        top_token_count(toks) * 10000.0 / F.greatest(F.size(toks), F.lit(1))
    ).cast("long")


def dup_bigram_4dp_expr(toks: Column) -> Column:
    """floor(duplicate-bigram share * 10000) over a token array (shared
    digest, see top_word_4dp_expr)."""
    bi = word_bigrams(toks)
    n_bi = F.size(bi)
    return F.floor(
        (n_bi - F.size(F.array_distinct(bi))) * 10000.0 / F.greatest(n_bi, F.lit(1))
    ).cast("long")


def stopword_4dp_expr(toks: Column, stopwords: list[str] | None = None) -> Column:
    """floor(stopword share * 10000) over a token array (shared digest,
    see top_word_4dp_expr)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.floor(n_sw * 10000.0 / F.greatest(F.size(toks), F.lit(1))).cast("long")


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): share of the
    most frequent word and share of duplicate word-bigrams. Everything is
    computed inside the row (array HOFs) — a map-only plan with no exchange,
    so the filter costs one scan at any corpus size."""
    d = docs.select(F.col(id_col), normalize_tokens(text_col).alias("toks"))
    toks = F.col("toks")
    n = F.size(toks)
    top_c = top_token_count(toks)
    return d.select(
        id_col,
        n.alias("n_words"),
        top_c.alias("top_word_c"),
        top_word_4dp_expr(toks).alias("top_word_4dp"),
        dup_bigram_4dp_expr(toks).alias("dup_bigram_4dp"),
    )


PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\+1-555-[0-9]{4}"


def scrub_pii(text_col: Column | str) -> Column:
    """Redact emails and phone numbers (global replace, native regex — the
    patterns are RE2/Java-compatible so the same rule set runs in Spark and
    an offline SQL audit). The standard pre-training scrub pass."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    out = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def pii_counts(text_col: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts — the audit columns logged next to
    the scrub so dropped-PII volume is quantified per partition."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return (
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0)),
        F.size(F.regexp_extract_all(c, F.lit(PII_PHONE_RE), 0)),
    )


PII_IPV4_RE = (
    r"(?<![0-9]\.)\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b(?!\.[0-9])"
)
# card-number CANDIDATES: 13-16 digit runs; the Luhn checksum decides
# which actually redact (an order id or timestamp fails the checksum)
PII_CC_CANDIDATE_RE = r"\b[0-9]{13,16}\b"


def luhn_valid(s: Column | str) -> Column:
    """Luhn checksum over a digit string — PURE column expressions
    (sequence + transform + aggregate run inside codegen; no UDF):
    from the RIGHT, double every second digit, subtract 9 when the
    double exceeds 9, and require the total to be divisible by 10."""
    c = F.col(s) if isinstance(s, str) else s
    rev = F.reverse(c)
    digits = F.transform(
        F.sequence(F.lit(1), F.length(rev)),
        lambda p: rev.substr(p, F.lit(1)).cast("int"),
    )
    weighted = F.transform(
        digits,
        lambda d, i: F.when(
            i % 2 == 1, F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        ).otherwise(d),
    )
    total = F.aggregate(weighted, F.lit(0), lambda a, x: a + x)
    return (total % 10 == 0) & (F.length(c) >= 13)


def scrub_pii_extended(text_col: Column | str) -> Column:
    """Emails, phones, IPv4 literals, and LUHN-VALID card numbers ->
    <EMAIL>/<PHONE>/<IP>/<CC>. 13-16 digit runs that fail the checksum
    (~90% of arbitrary numbers — order ids, most timestamps) are left
    intact: the checksum gate keeps recall-oriented scrubbing from
    destroying ordinary numeric text. The IPv4 lookarounds (Java regex;
    the simpler RE2-safe patterns above stay for the SQL-auditable
    scrub) stop partial matches inside longer dotted runs.

    All JVM-side: the per-match validity decision Spark's regexp_replace
    cannot express is an `aggregate` over the Luhn-filtered candidate
    list with the text as accumulator — one bounded fold per row, no
    Python in the hot path."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    out = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    valid_ccs = F.array_distinct(
        F.filter(
            F.regexp_extract_all(out, F.lit(PII_CC_CANDIDATE_RE), 0),
            lambda m: luhn_valid(m),
        )
    )
    return F.aggregate(
        valid_ccs,
        out,
        lambda acc, num: F.regexp_replace(
            acc, F.concat(F.lit(r"\b"), num, F.lit(r"\b")), "<CC>"
        ),
    )


def fingerprint(text_col: str = "text") -> Column:
    """Deterministic 128-bit content fingerprint of normalized text."""
    return F.md5(normalize_fast(text_col))


def rolling_fingerprints(
    text_col: str = "text", window: int = 5, tokens: Column | None = None
) -> Column:
    """Rolling window fingerprints: xxhash64 of each ``window``-token
    shingle — the building block for containment/overlap detection.

    At scale pass ``tokens`` as a MATERIALIZED column: token_ngrams embeds
    its input ~window+2 times top-level, so the default regex-backed
    normalize_tokens expression is duplicated that many times per row
    (the production shingle path, `dedup.span_shingles`, materializes the
    token array first for exactly this reason)."""
    from fel_spark.functions.text import token_ngrams

    toks = tokens if tokens is not None else normalize_tokens(text_col)
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


def corpus_profile(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group corpus profile: doc count, token totals, and EXACT token-
    length percentiles (p50/p90/p99, linear interpolation) — the audit
    table a pipeline run publishes next to its snapshots. ONE token-count
    projection + one hash aggregation; `F.percentile` is Spark's exact
    sort-within-group implementation, matching DuckDB's quantile_cont
    (R-7) bit-for-bit at %.6g. At 100 TB swap in `approx_percentile`
    with a documented error bound — same plan shape, no extra shuffle."""
    d = df.select(
        F.col(group_col).alias("grp"), token_count(text_col).alias("n_tokens")
    )
    return d.groupBy("grp").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.avg("n_tokens").alias("mean_tokens"),
        F.percentile("n_tokens", F.lit(0.5)).alias("p50_tokens"),
        F.percentile("n_tokens", F.lit(0.9)).alias("p90_tokens"),
        F.percentile("n_tokens", F.lit(0.99)).alias("p99_tokens"),
    )
