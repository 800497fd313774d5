"""Given-name bridging: one-table dual rendering parity, initials."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from fel_spark.functions.names import (
    NICKNAMES,
    canonical_given_name_col,
    canonical_given_name_sql,
    initials_col,
)


def test_canonical_name_column_matches_sql_rendering(spark):
    words = sorted(NICKNAMES) + ["william", "zebra", "x", ""]
    con = duckdb.connect()
    duck = {
        w: con.sql(
            f"SELECT {canonical_given_name_sql('w')} FROM (SELECT ? AS w) t",
            params=[w],
        ).fetchone()[0]
        for w in words
    }
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w", canonical_given_name_col(F.col("w")).alias("c")
    )
    for r in df.collect():
        assert r["c"] == duck[r["w"]], (r["w"], r["c"], duck[r["w"]])
        want = NICKNAMES.get(r["w"], r["w"])
        assert r["c"] == want


def test_nickname_bridge_beats_string_overlap(spark):
    # "bill" vs "william": canonical equality bridges what JW cannot
    df = spark.createDataFrame(
        [("bill", "william"), ("liz", "elizabeth"), ("mike", "susan")],
        "a string, b string",
    )
    out = df.select(
        "a",
        "b",
        (
            canonical_given_name_col(F.col("a"))
            == canonical_given_name_col(F.col("b"))
        ).alias("m"),
    ).collect()
    got = {(r["a"], r["b"]): r["m"] for r in out}
    assert got[("bill", "william")] and got[("liz", "elizabeth")]
    assert not got[("mike", "susan")]


def test_initials_col(spark):
    df = spark.createDataFrame(
        [("james robert smith",), ("ana",)], "s string"
    ).select(initials_col(F.split(F.col("s"), " ")).alias("i"))
    assert [r["i"] for r in df.collect()] == ["jrs", "a"]


# ---------------------------------------------------------------------------
# homoglyph folding (functions/text.py)


def test_fold_confusables_both_engines_agree(spark):
    from fel_spark.functions.text import (
        _CONFUSABLES,
        fold_confusables,
        fold_confusables_sql,
    )

    spoofs = [
        "раyраl",            # Cyrillic р/а
        "Μοscow",            # Greek Mu + omicron
        "plain ascii",
        "".join(_CONFUSABLES),  # every table entry at once
        "",
    ]
    con = duckdb.connect()
    duck = {
        s: con.sql(
            f"SELECT {fold_confusables_sql('s')} FROM (SELECT ? AS s) t",
            params=[s],
        ).fetchone()[0]
        for s in spoofs
    }
    df = spark.createDataFrame([(s,) for s in spoofs], "s string").select(
        "s", fold_confusables(F.col("s")).alias("f")
    )
    for r in df.collect():
        assert r["f"] == duck[r["s"]], (r["s"], r["f"], duck[r["s"]])
        assert all(ch not in _CONFUSABLES for ch in r["f"])
    assert duck["раyраl"] == "paypal"
    assert duck["Μοscow"] == "Moscow"
    assert duck["plain ascii"] == "plain ascii"
