"""Shipped language-ID and quality model weight tables.

The reference ships its trained datapack as data next to the code
(`README.md:10`); the pipeline analogue is a committed token-weight table
that the corpus plan loads by default, with the cheap heuristic only as
the no-model fallback — the heuristic must never be load-bearing on a
real run.

The language-ID table is a hand-curated frequency model over the highest-
frequency function words of five languages (public-knowledge word lists —
the same words every stopword corpus ships). Weights are tiered by
frequency rank and kept DYADIC (multiples of 1/4) so per-document weight
sums are bit-exact across engines — the property the driver oracle
digests rely on. Shared function words ("a" en/es/it, "la" fr/es/it,
"de" es/fr ...) carry weights in every language that uses them, so the
argmax genuinely arbitrates instead of keying on disjoint vocabularies.

The quality table is a linear bag-of-words scorer in the fastText/CCNet
shape: positive weight on high-register function/content words, negative
on boilerplate/spam markers, mean-pooled over ALL tokens + bias
(`textstats.quality_model_score`).

Swap either table for a trained one (fastText reduction, wiki-ref
classifier) without touching any operator: the loaders below are the only
coupling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# fmt: off
LANGID_WEIGHTS: dict[str, dict[str, float]] = {
    "en": {
        "the": 1.0, "of": 0.75, "and": 0.75, "to": 0.75, "in": 0.5,
        "a": 0.5, "is": 0.5, "that": 0.5, "it": 0.5, "was": 0.5,
        "for": 0.5, "on": 0.25, "are": 0.25, "as": 0.25, "with": 0.25,
        "his": 0.25, "they": 0.25, "at": 0.25, "be": 0.25, "this": 0.25,
        "have": 0.25, "from": 0.25, "or": 0.25, "had": 0.25, "by": 0.25,
        "not": 0.25, "but": 0.25, "what": 0.25, "all": 0.25, "were": 0.25,
    },
    # vocabulary is ASCII-folded to match `normalize_tokens` output
    # (accented forms never survive the fast normalizer)
    "de": {
        "der": 1.0, "die": 1.0, "und": 0.75, "das": 0.75, "ist": 0.75,
        "nicht": 0.5, "ich": 0.5, "sie": 0.5, "du": 0.5, "es": 0.5,
        "ein": 0.5, "eine": 0.5, "mit": 0.5, "den": 0.5, "zu": 0.5,
        "dem": 0.25, "auf": 0.25, "durch": 0.25, "von": 0.25, "war": 0.25,
        "sich": 0.25, "auch": 0.25, "als": 0.25, "aber": 0.25, "nach": 0.25,
        "bei": 0.25, "aus": 0.25, "wenn": 0.25, "nur": 0.25, "noch": 0.25,
    },
    "fr": {
        "le": 1.0, "la": 0.75, "les": 0.75, "et": 0.75, "des": 0.75,
        "est": 0.75, "un": 0.5, "une": 0.5, "du": 0.5, "que": 0.5,
        "qui": 0.5, "dans": 0.5, "pour": 0.5, "pas": 0.5, "ce": 0.5,
        "il": 0.25, "au": 0.25, "sur": 0.25, "ne": 0.25, "se": 0.25,
        "plus": 0.25, "par": 0.25, "avec": 0.25, "sont": 0.25, "mais": 0.25,
        "nous": 0.25, "vous": 0.25, "ou": 0.25, "son": 0.25, "aux": 0.25,
        "de": 0.5, "en": 0.25, "a": 0.25,
    },
    "es": {
        "el": 1.0, "la": 0.75, "los": 0.75, "las": 0.75, "y": 0.75,
        "es": 0.5, "un": 0.25, "una": 0.5, "del": 0.5, "que": 0.5,
        "se": 0.25, "por": 0.5, "para": 0.5, "con": 0.5, "no": 0.5,
        "su": 0.25, "al": 0.25, "lo": 0.25, "como": 0.25, "cuando": 0.25,
        "pero": 0.25, "sus": 0.25, "le": 0.25, "ya": 0.25, "o": 0.25,
        "este": 0.25, "hasta": 0.25, "porque": 0.25, "esta": 0.25, "entre": 0.25,
        "de": 0.5, "en": 0.5, "a": 0.25,
    },
    "it": {
        "il": 1.0, "di": 0.75, "che": 0.75, "sulla": 0.25, "non": 0.5,
        "per": 0.25, "gli": 0.5, "della": 0.5, "lo": 0.25, "ma": 0.25,
        "si": 0.25, "con": 0.25, "sono": 0.5, "una": 0.25, "anche": 0.25,
        "come": 0.25, "del": 0.25, "nel": 0.25, "degli": 0.25, "questo": 0.25,
        "alla": 0.25, "essere": 0.25, "da": 0.25, "un": 0.25, "dei": 0.25,
        "le": 0.25, "la": 0.25, "e": 0.5, "a": 0.25, "in": 0.25,
    },
}

QUALITY_WEIGHTS: dict[str, float] = {
    # high-register content/function markers (positive)
    "the": 0.5, "of": 0.25, "and": 0.25, "which": 0.5, "however": 0.75,
    "although": 0.75, "because": 0.5, "therefore": 0.75, "between": 0.5,
    "during": 0.5, "analysis": 1.0, "research": 1.0, "study": 0.75,
    "data": 0.75, "results": 0.75, "published": 0.75, "according": 0.5,
    "described": 0.5, "approximately": 0.75, "significant": 0.5,
    # boilerplate / spam markers (negative)
    "click": -1.5, "subscribe": -1.5, "buy": -1.25, "free": -0.75,
    "cheap": -1.25, "discount": -1.25, "offer": -0.75, "deal": -0.75,
    "win": -0.75, "prize": -1.0, "viagra": -2.0, "casino": -2.0,
    "lottery": -1.5, "unsubscribe": -1.0, "newsletter": -0.5,
    "cookie": -0.5, "javascript": -0.75, "login": -0.5, "signup": -1.0,
    "http": -0.75, "www": -0.75, "com": -0.5,
}
QUALITY_BIAS: float = -0.25
# fmt: on


def default_langid_model():
    """The shipped LangIdModel — the corpus plan's default scorer.

    Loads the TRAINED table (`fel_spark/models/trained.py`, a logistic
    reduction over the public lexicons — scripts/train_langmodels.py);
    the hand-curated tiers above remain available as `LANGID_WEIGHTS`
    for comparison and as the training lexicon."""
    from fel_spark.models.trained import TRAINED_LANGID_WEIGHTS
    from fel_spark.operators.textstats import LangIdModel

    return LangIdModel(TRAINED_LANGID_WEIGHTS)


def default_quality_model():
    """The shipped QualityModel (trained linear bag-of-words + bias)."""
    from fel_spark.models.trained import (
        TRAINED_QUALITY_BIAS,
        TRAINED_QUALITY_WEIGHTS,
    )
    from fel_spark.operators.textstats import QualityModel

    return QualityModel(TRAINED_QUALITY_WEIGHTS, bias=TRAINED_QUALITY_BIAS)


def langid_weights_df(spark: SparkSession) -> DataFrame:
    """The weight table as a DataFrame (lang, token, weight) — the parquet-
    shippable form for runs that load weights from a table instead of the
    committed module."""
    rows = [
        (lang, tok, float(w))
        for lang, tw in LANGID_WEIGHTS.items()
        for tok, w in tw.items()
    ]
    return spark.createDataFrame(rows, "lang string, token string, weight double")
