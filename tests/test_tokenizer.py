from __future__ import annotations

import random
from collections import Counter

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from fel_spark.operators.tokenizer import (
    _scan_merge,
    bpe_encode_word,
    tokenize_bpe,
    train_bpe_merges,
    word_counts,
)


def test_scan_merge_greedy_left_to_right():
    assert _scan_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert _scan_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _scan_merge(list("abab"), "a", "b") == ["ab", "ab"]
    assert _scan_merge(["x", "a", "b", "y"], "a", "b") == ["x", "ab", "y"]
    # merged symbols never confuse boundaries
    assert _scan_merge(["xa", "b"], "a", "b") == ["xa", "b"]
    assert _scan_merge(["a", "ab"], "a", "a") == ["a", "ab"]


def _naive_train(word_cnt: dict[str, int], num_merges: int) -> list[tuple[str, str, int]]:
    """Independent reference trainer: Counter-based, recomputed from
    scratch each round (different code path from the operator's loop)."""
    vocab = {w: [list(w), c] for w, c in word_cnt.items() if w}
    merges = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        best_n = max(counts.values())
        a, b = min(p for p, n in counts.items() if n == best_n)
        merges.append((a, b, best_n))
        for v in vocab.values():
            v[0] = _scan_merge(v[0], a, b)
    return merges


def test_train_matches_naive_reference():
    rng = random.Random(7)
    alphabet = "abcd"
    for trial in range(20):
        words = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))): rng.randint(1, 9)
            for _ in range(rng.randint(3, 30))
        }
        pdf = pd.DataFrame({"word": list(words), "cnt": list(words.values())})
        got = train_bpe_merges(pdf, num_merges=6, min_pair_count=1)
        want = _naive_train(words, 6)
        assert got == want, f"trial {trial}: {got} != {want}"


def _priority_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Independent encoder: repeatedly merge the LOWEST-RANK pair present."""
    syms = list(word)
    while len(syms) >= 2:
        cand = [
            (ranks[p], i)
            for i, p in enumerate(zip(syms, syms[1:]))
            if p in ranks
        ]
        if not cand:
            break
        r = min(c[0] for c in cand)
        a, b = None, None
        for (a2, b2), rr in ranks.items():
            if rr == r:
                a, b = a2, b2
        syms = _scan_merge(syms, a, b)
    return syms


def test_rank_order_apply_equals_priority_encode():
    rng = random.Random(11)
    alphabet = "abc"
    for trial in range(15):
        words = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10))): rng.randint(1, 5)
            for _ in range(rng.randint(5, 25))
        }
        pdf = pd.DataFrame({"word": list(words), "cnt": list(words.values())})
        merges = train_bpe_merges(pdf, num_merges=8, min_pair_count=1)
        ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
        for w in list(words) + ["aabbaabb", "cccccc", "abcabcabc"]:
            assert bpe_encode_word(w, merges) == _priority_encode(w, ranks)


def test_encode_round_trip_and_min_pair_count():
    pdf = pd.DataFrame({"word": ["ababab", "abc"], "cnt": [3, 1]})
    merges = train_bpe_merges(pdf, num_merges=10, min_pair_count=2)
    # only pairs with weighted count >= 2 are learnable
    assert all(c >= 2 for _, _, c in merges)
    for w in ["ababab", "abc", "zzz", ""]:
        assert "".join(bpe_encode_word(w, merges)) == w


def test_tokenize_bpe_spark(spark):
    df = spark.createDataFrame(
        [(1, "the then other"), (2, "THE Then"), (3, ""), (4, "zzz")],
        "doc_id long, text string",
    )
    merges = [("t", "h"), ("th", "e")]
    out = (
        tokenize_bpe(df, merges)
        .select("doc_id", "bpe_tokens")
        .orderBy("doc_id")
        .collect()
    )
    assert out[0].bpe_tokens == ["the", "the", "n", "o", "the", "r"]
    # normalize_fast lowercases first, so THE == the
    assert out[1].bpe_tokens == ["the", "the", "n"]
    assert out[2].bpe_tokens == []
    assert out[3].bpe_tokens == ["z", "z", "z"]


def test_tokenize_partition_invariance(spark, tiny_corpus):
    d = tiny_corpus.select(
        F.monotonically_increasing_id().alias("doc_id"), F.col("text")
    ).limit(200)
    merges = train_bpe_merges(word_counts(d), num_merges=12)
    one = (
        tokenize_bpe(d.coalesce(1), merges)
        .select("doc_id", F.concat_ws(" ", "bpe_tokens").alias("t"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    many = (
        tokenize_bpe(d.repartition(7), merges)
        .select("doc_id", F.concat_ws(" ", "bpe_tokens").alias("t"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)


def test_trained_tokenize_round_trips_corpus(spark, tiny_corpus):
    d = tiny_corpus.limit(100)
    merges = train_bpe_merges(word_counts(d), num_merges=20)
    assert len(merges) == 20
    from fel_spark.functions.text import normalize_tokens

    bad = (
        tokenize_bpe(d, merges)
        .select(
            F.concat_ws("", "bpe_tokens").alias("joined"),
            F.concat_ws("", normalize_tokens("text")).alias("norm"),
        )
        .filter(F.col("joined") != F.col("norm"))
        .count()
    )
    # token concatenation reproduces the normalized character stream
    assert bad == 0


def test_pinned_apply_matches_duckdb_replace_replay(spark):
    """The oracle trick used by the driver query: BPE apply == nested
    2-pass string replaces on a delimiter-framed char sequence."""
    merges = [("t", "h"), ("th", "e"), ("a", "n"), ("i", "n"), ("in", "e"),
              ("o", "w"), ("e", "r"), ("s", "t")]
    texts = [
        "the window is in line",
        "order by the stream then merge",
        "thththth stst anan inine",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = (
        tokenize_bpe(df, merges)
        .select("doc_id", F.concat_ws(" ", "bpe_tokens").alias("toks"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expr = "'|' || regexp_replace(w, '(.)', '\\1|', 'g')"
    for a, b in merges:
        pat, rep = f"'|{a}|{b}|'", f"'|{a}{b}|'"
        expr = f"replace(replace({expr}, {pat}, {rep}), {pat}, {rep})"
    con = duckdb.connect()
    con.register("docs", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    want = con.execute(f"""
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                               t -> len(t) > 0) AS toks
            FROM docs
        )
        SELECT doc_id,
               coalesce(array_to_string(flatten(list_transform(toks,
                   w -> list_filter(string_split({expr}, '|'), x -> len(x) > 0))), ' '), '') AS toks
        FROM d ORDER BY doc_id
    """).df()
    assert list(got["toks"]) == list(want["toks"])


def test_two_merge_tables_same_session_no_cache_collision(spark):
    """Python workers are reused across jobs, so the worker-global encode
    cache must be keyed by merge table: a second tokenize with DIFFERENT
    merges must not serve the first table's cached tokens."""
    df = spark.createDataFrame(
        [(i, "the then stream") for i in range(50)], "doc_id long, text string"
    )
    a = tokenize_bpe(df, [("t", "h"), ("th", "e")])
    got_a = a.select("bpe_tokens").first().bpe_tokens
    b = tokenize_bpe(df, [("s", "t"), ("e", "n")])
    got_b = b.select("bpe_tokens").first().bpe_tokens
    assert got_a == ["the", "the", "n", "s", "t", "r", "e", "a", "m"]
    assert got_b == ["t", "h", "e", "t", "h", "en", "st", "r", "e", "a", "m"]
