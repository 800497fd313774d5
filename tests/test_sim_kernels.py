"""Pure-NumPy parity tests for the vectorized similarity kernels (no Spark).

- jaro_winkler_batch must be bitwise identical to the scalar reference
  implementation (which itself is DuckDB-fuzz-parity-checked in
  test_fuzz_parity.py) on random and adversarial inputs.
- bigram_multiset_dice_matrix must match a line-by-line transcription of
  `CompressedSingleFileEntitySimilarityUtil.lexicalSimilarity`
  (`w2v/CompressedSingleFileEntitySimilarityUtil.java:147-164`) — the greedy
  remove-on-match multiset intersection over RAW pair counts.
- TypeLM.score_batch must match the scalar TypeLM.score (itself a
  transcription of `LMLREntityContext.getScoreOf`).
"""

from __future__ import annotations

import pickle
import random

import numpy as np
import pandas as pd
import pytest

from fel_spark.functions.sim import (
    bigram_multiset_dice_matrix,
    jaro_winkler,
    jaro_winkler_batch,
)
from fel_spark.operators.typelm import TypeLM, ngram_mix


def _java_lexical_similarity(p1: str, p2: str) -> float:
    """Transcription of lexicalSimilarity (:147-164): greedy multiset
    intersection, raw-size denominator. 0/0 handled as the coherence
    module's convention (equal -> 1.0)."""

    def word_letter_pairs(s: str) -> list[str]:
        out: list[str] = []
        for w in s.split():
            out.extend(w[i : i + 2] for i in range(len(w) - 1))
        return out

    pairs1, pairs2 = word_letter_pairs(p1), word_letter_pairs(p2)
    union = len(pairs1) + len(pairs2)
    if union == 0:
        return 1.0 if p1 == p2 else 0.0
    inter = 0
    for a in pairs1:
        for j, b in enumerate(pairs2):
            if a == b:
                inter += 1
                pairs2.pop(j)
                break
    return 2.0 * inter / union


JW_EDGE_CASES = [
    ("", ""),
    ("a", ""),
    ("", "a"),
    ("a", "a"),
    ("ab", "ba"),
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("aaaa", "aaaa"),
    ("abcabc", "cbacba"),
    ("x" * 50, "x" * 50),
    ("日本語", "日本誤"),
    ("the life of brian", "the life of brian 2"),
]


def test_jaro_winkler_batch_matches_scalar_edges():
    got = jaro_winkler_batch([a for a, _ in JW_EDGE_CASES], [b for _, b in JW_EDGE_CASES])
    exp = np.array([jaro_winkler(a, b) for a, b in JW_EDGE_CASES])
    np.testing.assert_array_equal(got, exp)


def test_jaro_winkler_batch_matches_scalar_fuzz():
    rng = random.Random(1234)

    def rs(maxlen):
        return "".join(
            rng.choice("abcdefgh ") for _ in range(rng.randint(0, maxlen))
        )

    for maxlen in (6, 15, 40):
        a = [rs(maxlen) for _ in range(2000)]
        b = [rs(maxlen) for _ in range(2000)]
        got = jaro_winkler_batch(a, b)
        exp = np.array([jaro_winkler(x, y) for x, y in zip(a, b)])
        np.testing.assert_array_equal(got, exp)


def test_bigram_dice_matrix_matches_java_multiset():
    strs_a = ["mississippi", "banana", "anna karenina", "x", "", "hello world", "aaaa"]
    strs_b = ["mississauga", "bandana", "anna k", "y", "", "hello world", "aa aa"]
    M = bigram_multiset_dice_matrix(strs_a, strs_b)
    for i, a in enumerate(strs_a):
        for j, b in enumerate(strs_b):
            assert M[i, j] == pytest.approx(_java_lexical_similarity(a, b), abs=1e-12)


def test_bigram_dice_matrix_fuzz_vs_java():
    rng = random.Random(7)
    words = ["anna", "banana", "na", "miss", "issi", "ppi", "a", "ab", "ba"]
    strs_a = [" ".join(rng.choices(words, k=rng.randint(0, 4))) for _ in range(60)]
    strs_b = [" ".join(rng.choices(words, k=rng.randint(0, 4))) for _ in range(40)]
    M = bigram_multiset_dice_matrix(strs_a, strs_b)
    for i in range(0, 60, 7):
        for j in range(0, 40, 5):
            assert M[i, j] == pytest.approx(
                _java_lexical_similarity(strs_a[i], strs_b[j]), abs=1e-12
            )


def _toy_lm() -> TypeLM:
    rng = random.Random(7)
    vocabw = ["alpha", "beta", "gamma", "delta", "x", "y"]
    lm: dict[tuple[str, str], int] = {}
    for t in ("T1", "T2", "T3"):
        for _ in range(30):
            g = "_".join(rng.choice(vocabw) for _ in range(rng.randint(1, 3)))
            lm[(t, g)] = lm.get((t, g), 0) + rng.randint(1, 5)
    tf: dict[str, int] = {}
    bg: dict[str, int] = {}
    tot = 0
    for (t, g), f in lm.items():
        tf[t] = tf.get(t, 0) + f
        bg[g] = bg.get(g, 0) + f
        tot += f
    return TypeLM(lm, tf, bg, tot)


def test_type_lm_score_batch_matches_scalar():
    rng = random.Random(11)
    vocabw = ["alpha", "beta", "gamma", "delta", "x", "y"]
    # pickle round-trip: executors see the broadcast-unpickled object
    m = pickle.loads(pickle.dumps(_toy_lm()))
    cases = [
        (rng.choice(["T1", "T2", "T3", "UNK", None]),
         [rng.choice(vocabw) for _ in range(rng.randint(0, 5))])
        for _ in range(500)
    ]
    exp = np.array([m.score(t, ngram_mix(toks)) for t, toks in cases])
    # flat gram construction exactly as the type_lm_scores UDF builds it
    ex = pd.Series([toks for _, toks in cases]).explode().dropna()
    rows = ex.index.to_numpy(np.int64)
    words = ex.to_numpy(dtype=object)
    adj2 = np.nonzero(rows[1:] == rows[:-1])[0] + 1
    adj3 = np.nonzero(rows[2:] == rows[:-2])[0] + 2
    bi = words[adj2 - 1] + "_" + words[adj2] if len(adj2) else words[:0]
    tri = (
        words[adj3 - 2] + "_" + words[adj3 - 1] + "_" + words[adj3]
        if len(adj3)
        else words[:0]
    )
    grams = np.concatenate([words, bi, tri])
    g_rows = np.concatenate([rows, rows[adj2], rows[adj3]])
    got = m.score_batch(
        np.array([t for t, _ in cases], dtype=object), grams, g_rows, len(cases)
    )
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-12)


def test_ngram_mix_multiset_is_all_uni_bi_tri():
    """The vectorized scorer relies on this identity: ngram_mix's MULTISET
    equals {all unigrams} + {all adjacent bigrams} + {all trigrams}."""
    from collections import Counter

    rng = random.Random(3)
    for _ in range(300):
        toks = [rng.choice("abcde") for _ in range(rng.randint(0, 7))]
        flat = Counter(toks)
        flat.update("_".join(toks[i : i + 2]) for i in range(len(toks) - 1))
        flat.update("_".join(toks[i : i + 3]) for i in range(len(toks) - 2))
        assert Counter(ngram_mix(toks)) == flat
