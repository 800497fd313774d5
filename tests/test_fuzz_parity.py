"""Seeded-fuzz parity: core kernels vs DuckDB on hundreds of random inputs.

Per-example property testing through Spark would pay a job per example;
instead a seeded generator builds one batch of adversarial strings and the
whole batch crosses each engine ONCE — same coverage, two jobs total.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

# curated alphabet: ASCII + punctuation runs + unicode that must never
# lower-case INTO [a-z0-9] (keeps JVM/Python/DuckDB lower() differences out
# of scope, which matches the engine's documented ASCII normalize contract)
_CHARS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "  ..,;:!?'\"()[]{}%$#@&*-_=+/\\|~`^\n\t"
    "éüöçñ中文日本語αβπ→…–—"
)


def _rand_strings(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randrange(0, 80)
        out.append("".join(rng.choice(_CHARS) for _ in range(k)))
    return out


def test_normalize_fast_fuzz_parity(spark):
    from fel_spark.functions.text import NORMALIZE_SQL, normalize_fast

    vals = _rand_strings(400, seed=20260817)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["i", "t"])
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_fast("t").alias("n")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE v(i INT, t VARCHAR)")
    con.executemany("INSERT INTO v VALUES (?, ?)", list(enumerate(vals)))
    want = dict(
        con.execute(
            f"SELECT i, {NORMALIZE_SQL.format(col='t')} FROM v"
        ).fetchall()
    )
    assert got == want


def test_md5_hash60_fuzz_parity(spark):
    from fel_spark.functions.hashing import md5_hash60

    vals = _rand_strings(300, seed=4242)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["i", "t"])
    got = {
        r["i"]: r["h"]
        for r in df.select("i", md5_hash60(F.col("t"), 99).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE v(i INT, t VARCHAR)")
    con.executemany("INSERT INTO v VALUES (?, ?)", list(enumerate(vals)))
    want = dict(
        con.execute(
            "SELECT i, CAST(('0x' || substr(md5('99:' || t), 1, 15)) AS BIGINT) FROM v"
        ).fetchall()
    )
    assert got == want


def test_jaro_winkler_fuzz_parity(spark):
    """The pairwise scorer's JW must match DuckDB's jaro_winkler_similarity
    (the oracle contract) on random short surface forms."""
    from fel_spark.functions.sim import jaro_winkler

    rng = random.Random(7)
    alpha = "abcdefg "
    pairs = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 12))).strip(),
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 12))).strip(),
        )
        for _ in range(250)
    ]
    # both-empty is the one documented divergence: we return 1.0 (the
    # jellyfish / Apache commons convention), DuckDB returns 0.0; empty
    # spans never reach the pairwise scorer (non-empty by construction)
    pairs = [(a, b) for a, b in pairs if a or b]
    got = [jaro_winkler(a, b) for a, b in pairs]
    con = duckdb.connect()
    for (a, b), g in zip(pairs, got):
        w = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert g == pytest.approx(w, abs=1e-9), (a, b, g, w)


def test_bigram_dice_expr_fuzz_vs_java(spark):
    """The two-tier bigram_dice COLUMN EXPRESSION (native set fast path +
    interpreted multiset branch on rows with repeated bigrams) must match
    the Java lexicalSimilarity transcription on strings with and without
    repeats — one Spark job for the whole batch."""
    from fel_spark.functions.sim import bigram_dice
    from fel_spark.functions.text import char_bigrams

    rng = random.Random(13)
    words = ["anna", "banana", "miss", "issi", "alpha", "beta", "aa", "ab"]
    pairs = [
        (
            " ".join(rng.choices(words, k=rng.randrange(0, 4))),
            " ".join(rng.choices(words, k=rng.randrange(0, 4))),
        )
        for _ in range(200)
    ] + [("mississippi", "mississauga"), ("aaaa", "aa aa"), ("", ""), ("x", "y")]

    def java_lex(p1: str, p2: str) -> float:
        def wlp(s):
            out = []
            for w in s.split():
                out.extend(w[i : i + 2] for i in range(len(w) - 1))
            return out

        l1, l2 = wlp(p1), wlp(p2)
        union = len(l1) + len(l2)
        if union == 0:
            return 0.0  # expr convention: empty arrays -> 0.0
        inter = 0
        for x in l1:
            for j, y in enumerate(l2):
                if x == y:
                    inter += 1
                    l2.pop(j)
                    break
        return 2.0 * inter / union

    df = spark.createDataFrame(pairs, ["a", "b"]).select(
        "a", "b",
        bigram_dice(char_bigrams(F.col("a")), char_bigrams(F.col("b"))).alias("dice"),
    )
    for r in df.collect():
        assert r["dice"] == pytest.approx(java_lex(r["a"], r["b"]), abs=1e-12), (
            r["a"], r["b"],
        )
