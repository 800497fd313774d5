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
