from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fel_spark.operators.qgramjoin import positional_qgrams, qgram_edit_join


def test_positional_qgrams_hand_case(spark):
    df = spark.createDataFrame([(1, "abcd")], ["id", "s"])
    got = sorted(
        (r["pos"], r["gram"], r["len"])
        for r in positional_qgrams(df, "s", "id", q=2).collect()
    )
    assert got == [(1, "ab", 4), (2, "bc", 4), (3, "cd", 4)]


def test_qgram_join_finds_all_ed1_pairs(spark):
    rows = [
        (1, "hillary clinton"),
        (2, "hilary clinton"),  # deletion: ed 1
        (3, "hillary clinton"),  # exact dup: ed 0
        (4, "hillarx clinton"),  # substitution: ed 1
        (5, "barack obama oo"),  # far
        (6, "hillary clintonx"),  # insertion at end: ed 1 vs 1/3
    ]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {
        (r["id_a"], r["id_b"]): r["ed"]
        for r in qgram_edit_join(df, "s", "id", d=1, q=2).collect()
    }
    expected = {
        (1, 2): 1,
        (1, 3): 0,
        (1, 4): 1,
        (1, 6): 1,
        (2, 3): 1,
        (3, 4): 1,
        (3, 6): 1,
    }
    assert got == expected


def test_qgram_join_parity_with_bruteforce(spark):
    # deterministic corpus of near-duplicates around a handful of stems
    stems = ["conversation", "transcription", "resolution xy", "blocking key"]
    rows = []
    rid = 0
    for stem in stems:
        for k in range(6):
            s = list(stem)
            if k % 3 == 1:
                s[k % len(s)] = "z"  # substitution
            elif k % 3 == 2:
                del s[k % len(s)]  # deletion
            rows.append((rid, "".join(s)))
            rid += 1
    df = spark.createDataFrame(rows, ["id", "s"]).cache()
    fast = {
        (r["id_a"], r["id_b"], r["ed"])
        for r in qgram_edit_join(df, "s", "id", d=2, q=2).collect()
    }
    a = df.select(F.col("id").alias("id_a"), F.col("s").alias("sa"))
    b = df.select(F.col("id").alias("id_b"), F.col("s").alias("sb"))
    brute = {
        (r["id_a"], r["id_b"], r["ed"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("ed", F.levenshtein("sa", "sb").cast("int"))
        .filter(F.col("ed") <= 2)
        .collect()
    }
    assert fast == brute
    df.unpersist()


def test_qgram_join_excludes_short_strings(spark):
    # min_len for d=1, q=2 is 5: 4-char strings are out of contract
    df = spark.createDataFrame([(1, "abcd"), (2, "abce")], ["id", "s"])
    assert qgram_edit_join(df, "s", "id", d=1, q=2).count() == 0
