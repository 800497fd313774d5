from __future__ import annotations

from pyspark.sql import functions as F

from fel_spark.functions.hashing import md5_hash60
from fel_spark.operators.editsim import numeric_date_scores
from fel_spark.operators.pprl import (
    bloom_encode,
    pprl_bloom_pairs,
)


def _encode_py(text: str, m: int, k: int, seed: int, spark) -> list[int]:
    """Plain replay of the encoding through the same md5 column helper,
    one gram at a time — independent of the array plumbing under test."""
    grams = []
    for w in text.split(" "):
        grams += [w[i : i + 2] for i in range(len(w) - 1)]
    if not grams:
        return []
    df = spark.createDataFrame([(g,) for g in grams], ["g"])
    pos = set()
    for i in range(k):
        pos |= {
            r[0]
            for r in df.select(
                F.pmod(md5_hash60(F.col("g"), seed + i), F.lit(m))
            ).collect()
        }
    return sorted(pos)


def test_bloom_encode_matches_scalar_replay(spark):
    rows = [(0, "hillary clinton"), (1, "hilary clinton"), (2, "x")]
    df = spark.createDataFrame(rows, ["id", "name"])
    enc = {
        r["id"]: list(r["bloom"])
        for r in bloom_encode(df, "name", "id", m=64, k=3, seed=7).collect()
    }
    for rid, text in rows:
        assert enc[rid] == _encode_py(text, 64, 3, 7, spark), text
    # single-char word -> no bigrams -> empty filter
    assert enc[2] == []


def test_pprl_dice_orders_like_similarity(spark):
    rows = [
        (0, 1, "hillary clinton"),
        (1, 1, "hilary clinton"),  # near-dup of 0
        (2, 1, "barack obama"),  # unrelated, same block
        (3, 2, "hillary clinton"),  # other block: never paired with 0
    ]
    df = spark.createDataFrame(rows, ["id", "bk", "name"])
    got = {
        (r["id_a"], r["id_b"]): r
        for r in pprl_bloom_pairs(df, "name", "id", "bk").collect()
    }
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    near, far = got[(0, 1)], got[(0, 2)]
    assert near["dice_4dp"] > far["dice_4dp"]
    assert near["dice_4dp"] > 8000  # one-char typo keeps most bigrams
    assert far["dice_4dp"] < 4000
    # Dice internals are consistent
    for r in got.values():
        assert 0 <= r["n_common"] <= min(r["n_bits_a"], r["n_bits_b"])
        denom = r["n_bits_a"] + r["n_bits_b"]
        assert r["dice_4dp"] == int(2 * r["n_common"] * 10000 / denom)


def test_numeric_date_scores_hand_values(spark):
    rows = [
        # id, num_a, num_b, ts_a, ts_b
        (0, 10.0, 10.0, "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
        (1, 10.0, 60.0, "2024-01-01 00:00:00", "2024-01-01 12:00:00"),
        (2, 0.0, 0.0, "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
        (3, -5.0, 5.0, "2024-01-01 00:00:00", "2024-01-01 00:00:30"),
    ]
    df = spark.createDataFrame(rows, ["id", "na", "nb", "tsa", "tsb"]).select(
        "id",
        "na",
        "nb",
        F.col("tsa").cast("timestamp").alias("tsa"),
        F.col("tsb").cast("timestamp").alias("tsb"),
    )
    out = {
        r["id"]: r
        for r in numeric_date_scores(
            df, "na", "nb", "tsa", "tsb", num_dmax=100.0, max_seconds=86_400
        ).collect()
    }
    r0 = out[0]
    assert (r0["num_sim_4dp"], r0["rel_sim_4dp"], r0["ts_sim_4dp"]) == (
        10000,
        10000,
        10000,
    )
    assert (r0["num_level"], r0["ts_level"]) == (2, 2)
    r1 = out[1]
    assert r1["abs_diff"] == 50.0
    assert r1["num_sim_4dp"] == 5000  # 1 - 50/100
    assert r1["rel_sim_4dp"] == int((1 - 50 / 60) * 10000)
    assert r1["sec_diff"] == 43_200
    assert r1["ts_sim_4dp"] == 5000
    assert (r1["num_level"], r1["ts_level"]) == (1, 1)
    r2 = out[2]
    assert r2["rel_sim_4dp"] == 10000  # 0 == 0 -> exact agreement
    assert r2["ts_sim_4dp"] == 0  # 48h > 24h window
    assert r2["ts_level"] == 0
    r3 = out[3]
    assert r3["abs_diff"] == 10.0
    assert r3["rel_sim_4dp"] == int((1 - 10 / 5) * 10000)  # negative -> -10000
    assert r3["sec_diff"] == 30
