"""TextTiling: plain-Python replay, planted topic-shift boundary,
short-document edge cases."""

from __future__ import annotations

import math
import random
import re

from fel_spark.operators.segmentation import text_tiles


def _half_away(x):
    # Spark F.round and DuckDB round() are HALF AWAY FROM ZERO on
    # doubles; Python's round is banker's — mirror the engines
    return math.floor(x + 0.5)


def _py_tiles(docs, w, k, hp):
    """Sequential replay of the deterministic TextTiling recast.
    ``docs`` = {id: text} -> {(id, gap): (cos, depth, thr, boundary)}."""
    out = {}
    for did, text in docs.items():
        toks = [
            t
            for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")
            if t
        ]
        seqs = [toks[i : i + w] for i in range(0, len(toks), w)]
        n = len(seqs)
        if n < 2:
            continue
        from collections import Counter

        cnt = [Counter(s) for s in seqs]
        cos = []
        for g in range(n - 1):
            lblk = Counter()
            for s in range(max(0, g - k + 1), g + 1):
                lblk += cnt[s]
            rblk = Counter()
            for s in range(g + 1, min(n, g + 1 + k)):
                rblk += cnt[s]
            dot = sum(lblk[t] * rblk[t] for t in lblk)
            l2 = sum(v * v for v in lblk.values())
            r2 = sum(v * v for v in rblk.values())
            cos.append(_half_away(dot / math.sqrt(l2 * r2) * 1_000_000))
        depths = []
        for g in range(n - 1):
            ml = max(cos[max(0, g - hp) : g + 1])
            mr = max(cos[g : min(n - 1, g + hp + 1)])
            depths.append((ml - cos[g]) + (mr - cos[g]))
        nn = len(depths)
        mean = sum(depths) / nn
        var = max(sum(d * d for d in depths) / nn - mean * mean, 0.0)
        thr = _half_away(mean + 0.5 * math.sqrt(var))
        for g in range(n - 1):
            out[(did, g)] = (
                cos[g],
                depths[g],
                thr,
                1 if depths[g] > thr else 0,
            )
    return out


def test_text_tiles_replay_fuzz(spark):
    rng = random.Random(139)
    vocab_a = ["alpha", "beta", "gamma", "delta", "epsilon"]
    vocab_b = ["server", "deploy", "rollback", "incident", "oncall"]
    docs = {}
    for d in range(6):
        n_tok = rng.randint(30, 90)
        flip = rng.randint(10, max(11, n_tok - 10))
        words = [
            rng.choice(vocab_a if i < flip else vocab_b)
            for i in range(n_tok)
        ]
        docs[d] = " ".join(words)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        (r["id"], r["gap"]): (
            r["cos_micro"],
            r["depth_micro"],
            r["threshold_micro"],
            r["is_boundary"],
        )
        for r in text_tiles(df, w=10, k=2, hp=2).collect()
    }
    assert got == _py_tiles(docs, 10, 2, 2)


def test_text_tiles_planted_shift_is_boundary(spark):
    # 40 tokens of pure topic A, then 40 of pure topic B: the gap at the
    # A/B seam must be the deepest valley and a boundary
    text = " ".join(["apple"] * 40 + ["rocket"] * 40)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {r["gap"]: r for r in text_tiles(df, w=10, k=2, hp=3).collect()}
    seam = 3  # gap between seq 3 (apples) and seq 4 (rockets)
    assert rows[seam]["cos_micro"] == 0
    assert rows[seam]["is_boundary"] == 1
    deepest = max(rows.values(), key=lambda r: r["depth_micro"])
    assert deepest["gap"] == seam
    # interior same-topic gaps are perfect cohesion, no boundary
    assert rows[1]["cos_micro"] == 1_000_000
    assert rows[1]["is_boundary"] == 0


def test_text_tiles_short_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "only five tokens right here"), (2, "")],
        "doc_id long, text string",
    )
    assert text_tiles(df, w=20).count() == 0
