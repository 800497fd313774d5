"""Soundex: the pure-column chain vs Spark's JVM built-in, the generated
DuckDB chain, and the phonetic blocking audit."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from fel_spark.functions.phonetic import soundex_col, soundex_sql
from fel_spark.operators.blocking import phonetic_block_stats

CANONICAL = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",  # H/W merge: S,C same code across the H
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",  # first-letter code collapse
    "Honeyman": "H555",
    "HANNAH": "H500",
    "WC": "W200",  # H/W-first: no leading code to drop
    "HB": "H100",
    "AARON": "A650",
    "a": "A000",
}


def test_soundex_canonical_vectors(spark):
    df = spark.createDataFrame(
        [(w,) for w in CANONICAL], "w string"
    ).select("w", soundex_col(F.col("w")).alias("sx"))
    got = {r["w"]: r["sx"] for r in df.collect()}
    assert got == CANONICAL


def test_soundex_matches_spark_builtin_fuzz(spark):
    """The column chain must equal Spark's JVM F.soundex (Apache Commons
    lineage) on random alphabetic words — one algorithm, three
    implementations once the DuckDB chain is included."""
    rng = random.Random(77)
    words = [
        "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(500)
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w",
        soundex_col(F.col("w")).alias("ours"),
        F.soundex(F.col("w")).alias("jvm"),
    )
    bad = df.filter(
        ~F.col("ours").eqNullSafe(F.upper(F.col("jvm")))
    ).collect()
    assert bad == [], [(r["w"], r["ours"], r["jvm"]) for r in bad[:5]]


def test_soundex_sql_matches_column_chain(spark):
    """The generated DuckDB rendering produces identical codes."""
    rng = random.Random(99)
    words = [
        "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(1, 10))
        )
        for _ in range(300)
    ] + list(CANONICAL) + ["", "123", "h w", "o'neill"]
    con = duckdb.connect()
    duck = {
        w: con.sql(
            f"SELECT {soundex_sql('w')} FROM (SELECT ? AS w) t", params=[w]
        ).fetchone()[0]
        for w in words
    }
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w", soundex_col(F.col("w")).alias("sx")
    )
    for r in df.collect():
        assert r["sx"] == duck[r["w"]], (r["w"], r["sx"], duck[r["w"]])


def test_phonetic_block_stats_hand_computed(spark):
    # Robert/Rupert share R163 across two records; 'zzz' isolates.
    df = spark.createDataFrame(
        [(1, "Robert calls Rupert"), (2, "rupert! zzz")],
        "record_id int, text string",
    )
    out = {r["code"]: r for r in phonetic_block_stats(df).collect()}
    r163 = out["R163"]
    assert r163["n_tokens"] == 3  # Robert, Rupert, rupert
    assert r163["n_forms"] == 3  # case-distinct surface forms
    assert r163["n_records"] == 2
    assert r163["n_cand_pairs"] == 1
    assert out["C420"]["n_tokens"] == 1  # calls
    assert out["Z000"]["n_records"] == 1 and out["Z000"]["n_cand_pairs"] == 0


def test_phonetic_block_stats_plan_one_aggregate(spark):
    """The whole chain is codegen column algebra: no Python eval, and
    the only exchange is the single hash-aggregate shuffle."""
    df = spark.createDataFrame([(1, "a b c")], "record_id int, text string")
    plan = (
        phonetic_block_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 2  # partial->final agg (+AQE read)


# ---------------------------------------------------------------------------
# Caverphone 2.0


def _py_caverphone2(s):
    import re

    from fel_spark.functions.phonetic import _CAVERPHONE2_RULES

    u = re.sub(r"[^a-z]", "", s.lower())
    if not u:
        return None
    x = u
    for pat, rep in _CAVERPHONE2_RULES:
        x = re.sub(pat, rep, x)
    return (x + "1111111111")[:10]


def test_caverphone2_published_vectors(spark):
    # the two worked examples from Hood's "Caverphone Revisited" paper
    from fel_spark.functions.phonetic import caverphone2_col

    df = spark.createDataFrame(
        [("Stevenson",), ("Thompson",)], "w string"
    ).select("w", caverphone2_col(F.col("w")).alias("cv"))
    got = {r["w"]: r["cv"] for r in df.collect()}
    assert got == {"Stevenson": "STFNSN1111", "Thompson": "TMPSN11111"}


def test_caverphone2_column_matches_python_and_sql(spark):
    """Three renderings of the one rule table (Spark columns, plain
    `re`, DuckDB SQL) must agree on random words + edge cases."""
    from fel_spark.functions.phonetic import caverphone2_col, caverphone2_sql

    rng = random.Random(101)
    words = [
        "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(300)
    ] + ["enough", "trough", "climb", "", "42", "o'brien", "why", "yes"]
    con = duckdb.connect()
    duck = {
        w: con.sql(
            f"SELECT {caverphone2_sql('w')} FROM (SELECT ? AS w) t",
            params=[w],
        ).fetchone()[0]
        for w in words
    }
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w", caverphone2_col(F.col("w")).alias("cv")
    )
    for r in df.collect():
        assert r["cv"] == _py_caverphone2(r["w"]), (r["w"], r["cv"])
        assert r["cv"] == duck[r["w"]], (r["w"], r["cv"], duck[r["w"]])
