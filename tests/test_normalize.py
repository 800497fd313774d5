"""Normalization semantics: bit-equality with the reference's normalizeFast
(`utils/Normalize.java:77-90`) for ASCII and with the DuckDB oracle expr."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from fel_spark.functions.text import (
    NORMALIZE_SQL,
    all_spans,
    char_bigrams,
    normalize_fast,
    normalize_tokens,
    token_ngrams,
)

CASES = [
    "Hello, World!",
    "  A--B__C  9z ",
    "UPPER lower 123",
    "",
    "...",
    "tab\tand\nnewline",
]


def test_normalize_matches_duckdb(spark):
    df = spark.createDataFrame([(c,) for c in CASES], ["text"])
    got = [r[0] for r in df.select(normalize_fast("text")).collect()]
    want = [
        duckdb.sql(
            "select " + NORMALIZE_SQL.format(col="?"), params=[c]
        ).fetchone()[0]
        for c in CASES
    ]
    assert got == want
    # reference semantics spot checks
    assert got[0] == "hello world"
    assert got[3] == "" and got[4] == ""


def test_tokens_and_ngrams(spark):
    df = spark.createDataFrame([("The quick brown fox",)], ["text"])
    toks = df.select(normalize_tokens("text").alias("t"))
    assert toks.collect()[0]["t"] == ["the", "quick", "brown", "fox"]
    bi = toks.select(token_ngrams(F.col("t"), 2).alias("g")).collect()[0]["g"]
    assert bi == ["the quick", "quick brown", "brown fox"]
    tri = toks.select(token_ngrams(F.col("t"), 5).alias("g")).collect()[0]["g"]
    assert tri == []


def test_all_spans(spark):
    df = spark.createDataFrame([("a b c",)], ["text"])
    spans = df.select(
        all_spans(normalize_tokens("text"), max_len=2).alias("s")
    ).collect()[0]["s"]
    got = {(r["span"], r["start"], r["length"]) for r in spans}
    assert got == {
        ("a", 1, 1),
        ("a b", 1, 2),
        ("b", 2, 1),
        ("b c", 2, 2),
        ("c", 3, 1),
    }


def test_char_bigrams(spark):
    df = spark.createDataFrame([("ab cde x",)], ["text"])
    got = df.select(char_bigrams("text").alias("b")).collect()[0]["b"]
    assert got == ["ab", "cd", "de"]


# --- P5: full punctuation + diacritics folding ------------------------------


def _java_fold_reference(s: str) -> str:
    """Character-level transcription of PunctuationDiacriticsFolder.normalize
    (`io/PunctuationDiacriticsFolder.java:28-36`)."""
    import re
    import unicodedata

    s = re.sub(r"[!-/:-@\[-`{-~]+", " ", s)  # \p{Punct}+ -> " "
    s = re.sub(r"[\s\x00-\x1f\x7f]+", " ", s)  # [\p{Space}\p{Cntrl}]+ -> " "
    s = unicodedata.normalize("NFD", s)
    s = "".join(
        ch
        for ch in s
        if not (
            0x0300 <= ord(ch) <= 0x036F
            or unicodedata.category(ch) in ("Lm", "Sk")
        )
    )
    return s.lower().strip()


FOLD_FIXTURE = [
    "café au lait",
    "naïve RÉSUMÉ",
    "Dvořák's 9th—Symphony!!",
    "  tabs\tand\nnewlines  ",
    "日本語はそのまま",  # CJK passthrough (no decomposition, no marks)
    "ʰsuperscript modifier",  # Lm stripped
    "a^b~c",  # ASCII Sk/punct -> spaces
    "ħ stays (no decomposition)",
    "",
    "ñõç đã Ω ω",
]


def test_fold_punct_diacritics_series_parity():
    import pandas as pd

    from fel_spark.functions.text import fold_punct_diacritics_series

    got = fold_punct_diacritics_series(pd.Series(FOLD_FIXTURE)).tolist()
    want = [_java_fold_reference(s) for s in FOLD_FIXTURE]
    assert got == want
    # spot-check the headline semantics
    assert got[0] == "cafe au lait"
    assert got[1] == "naive resume"
    assert "dvorak" in got[2]
    assert got[4] == "日本語はそのまま"


def test_normalize_full_spark(spark):
    from fel_spark.functions.text import normalize_full

    df = spark.createDataFrame([(i, s) for i, s in enumerate(FOLD_FIXTURE)], "i int, s string")
    rows = df.select("i", normalize_full("s").alias("n")).orderBy("i").collect()
    want = [_java_fold_reference(s) for s in FOLD_FIXTURE]
    assert [r["n"] for r in rows] == want


def test_token_ngrams_fuzz_vs_python(spark):
    """Property check for the zip_with n-gram kernel: Spark output equals a
    plain-Python sliding window for random token arrays (incl. empties,
    unicode, repeated tokens, size < n)."""
    import random

    rng = random.Random(20260817)
    vocab = ["a", "bb", "ccc", "δδ", "xy", "tok", "tok", "zz9", "日本", ""]
    rows = []
    for i in range(200):
        toks = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randrange(0, 12))]
        rows.append((i, toks))
    df = spark.createDataFrame(rows, "i int, toks array<string>")
    for n in (1, 2, 3, 7):
        got = {
            r["i"]: r["g"]
            for r in df.select("i", token_ngrams(F.col("toks"), n).alias("g")).collect()
        }
        for i, toks in rows:
            want = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
            assert got[i] == want, (n, toks, got[i], want)
