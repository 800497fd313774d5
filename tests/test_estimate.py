"""Chao1 duplicate-rate estimation: hand-computed histogram, planted
abundance recovery, deterministic-sample replay."""

from __future__ import annotations

import hashlib

from fel_spark.operators.estimate import dup_rate_estimate


def _sample_ids(ids, prefix, below):
    return [
        i
        for i in ids
        if hashlib.md5(str(i).encode()).hexdigest()[:prefix] < below
    ]


def test_dup_rate_estimate_hand_computed(spark):
    # keys chosen so the SAMPLED histogram is known exactly
    rows = [(i, f"k{i % 7}") for i in range(60)]
    df = spark.createDataFrame(rows, "record_id long, k string")
    got = dup_rate_estimate(df, "k").collect()[0]

    kept = _sample_ids(range(60), 4, "4000")
    from collections import Counter

    hist = Counter(Counter(f"k{i % 7}" for i in kept).values())
    n = len(kept)
    d = sum(hist.values())
    f1, f2 = hist.get(1, 0), hist.get(2, 0)
    assert got["n_sampled"] == n
    assert got["d_observed"] == d
    assert (got["f1"], got["f2"]) == (f1, f2)
    assert got["chao1_hat"] == d + (f1 * (f1 - 1)) // (2 * (f2 + 1))
    assert got["unseen_mass_micro"] == (f1 * 1_000_000) // n
    assert got["dup_rate_micro"] == ((n - d) * 1_000_000) // n


def test_chao1_recovers_planted_class_count(spark):
    # 200 distinct keys, each duplicated 8x, ids shuffled across keys:
    # a 1/4 sample sees most classes; chao1 >= observed and <= ~true+slack
    rows = [(i, f"e{i % 200}") for i in range(1600)]
    df = spark.createDataFrame(rows, "record_id long, k string")
    got = dup_rate_estimate(df, "k").collect()[0]
    assert got["d_observed"] <= 200
    assert got["chao1_hat"] >= got["d_observed"]
    # with 8 copies per class and a ~25% sample, nearly all classes are
    # observed and the correction is small
    assert 150 <= got["chao1_hat"] <= 260


def test_all_unique_sample_has_full_unseen_mass(spark):
    rows = [(i, f"u{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "record_id long, k string")
    got = dup_rate_estimate(df, "k").collect()[0]
    assert got["f1"] == got["d_observed"] == got["n_sampled"]
    assert got["dup_rate_micro"] == 0
    assert got["unseen_mass_micro"] == 1_000_000
    # bias-corrected chao1 stays defined with f2 = 0
    f1 = got["f1"]
    assert got["chao1_hat"] == f1 + (f1 * (f1 - 1)) // 2
