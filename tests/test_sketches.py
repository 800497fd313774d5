"""Count-Min sketch: exact grid replay, the >= truth invariant, and
mergeability."""

from __future__ import annotations

import hashlib
import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from fel_spark.operators.sketches import cms_estimates, count_min_cells

D, W = 4, 64


def _col(i, k):
    return int(hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:15], 16) % W


def _py_cells(keys):
    cells = defaultdict(int)
    for k in keys:
        for i in range(D):
            cells[(i, _col(i, k))] += 1
    return dict(cells)


def test_cms_grid_replay_fuzz(spark):
    rng = random.Random(151)
    keys = [f"k{rng.randint(0, 30)}" for _ in range(400)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        (r["depth_i"], r["col"]): r["cnt"]
        for r in count_min_cells(df, "k", depth=D, width=W).collect()
    }
    assert got == _py_cells(keys)


def test_cms_estimate_at_least_truth(spark):
    rng = random.Random(157)
    keys = [f"tok{rng.randint(0, 200)}" for _ in range(2000)]
    truth = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    cells = count_min_cells(df, "k", depth=D, width=W)
    probes = spark.createDataFrame(
        [(k, c) for k, c in truth.items()], "k string, true_cnt long"
    )
    est = {
        r["k"]: (r["true_cnt"], r["cms_est"])
        for r in cms_estimates(cells, probes, "k", depth=D, width=W).collect()
    }
    assert len(est) == len(truth)
    for k, (t, e) in est.items():
        assert e >= t, (k, t, e)
    # the grid is badly overloaded only if every estimate is inflated;
    # with 201 keys in a 4x64 grid most mins should be close to truth
    close = sum(1 for t, e in est.values() if e - t <= 2 * (2000 // W))
    assert close >= len(est) * 0.9


def test_cms_shards_merge_cellwise(spark):
    keys = [f"x{i % 9}" for i in range(300)]
    df = spark.createDataFrame(
        [(k, i % 3) for i, k in enumerate(keys)], "k string, shard int"
    )
    whole = {
        (r["depth_i"], r["col"]): r["cnt"]
        for r in count_min_cells(df, "k", depth=D, width=W).collect()
    }
    merged = defaultdict(int)
    for s in range(3):
        part = count_min_cells(
            df.filter(F.col("shard") == s), "k", depth=D, width=W
        )
        for r in part.collect():
            merged[(r["depth_i"], r["col"])] += r["cnt"]
    assert dict(merged) == whole


# ---------------------------------------------------------------------------
# HyperLogLog


def _py_hll_regs(keys, b=8):
    m = 1 << b
    regs = {}
    for k in set(keys):
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        bucket = h % m
        w = h // m
        rank = (60 - b + 1) if w == 0 else (60 - b) - w.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rank)
    return regs


def test_hll_registers_replay_and_dup_insensitive(spark):
    from fel_spark.operators.sketches import hll_registers

    rng = random.Random(163)
    keys = [f"u{rng.randint(0, 400)}" for _ in range(1500)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["bucket"]: r["rank"] for r in hll_registers(df, "k").collect()
    }
    assert got == _py_hll_regs(keys)
    # duplicate-insensitive: the distinct stream gives the same grid
    dedup = spark.createDataFrame([(k,) for k in set(keys)], "k string")
    got2 = {
        r["bucket"]: r["rank"] for r in hll_registers(dedup, "k").collect()
    }
    assert got2 == got


def test_hll_estimate_accuracy(spark):
    from fel_spark.operators.sketches import hll_estimate, hll_registers

    # m = 256 -> relative error ~1.04/sqrt(m) = 6.5% 1-sigma; assert 3x
    for n, seed in ((300, 1), (5000, 2)):
        keys = [f"s{seed}-{i}" for i in range(n)]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        est = hll_estimate(hll_registers(df, "k")).collect()[0]["est"]
        assert abs(est - n) / n < 0.20, (n, est)


def test_hll_shards_merge_by_max(spark):
    from fel_spark.operators.sketches import hll_registers

    keys = [f"m{i}" for i in range(900)]
    df = spark.createDataFrame(
        [(k, i % 3) for i, k in enumerate(keys)], "k string, shard int"
    )
    whole = {
        r["bucket"]: r["rank"] for r in hll_registers(df, "k").collect()
    }
    merged = {}
    for s in range(3):
        part = hll_registers(df.filter(F.col("shard") == s), "k")
        for r in part.collect():
            merged[r["bucket"]] = max(
                merged.get(r["bucket"], 0), r["rank"]
            )
    assert merged == whole


# ---------------------------------------------------------------------------
# streaming maintenance (streaming/incremental.py wrappers)


def test_cms_and_hll_stream_equal_batch(spark, tmp_path):
    from fel_spark.operators.sketches import count_min_cells, hll_registers
    from fel_spark.streaming.incremental import (
        cms_cells_stream,
        hll_registers_stream,
    )

    rng = random.Random(173)
    rows = [(f"key-{rng.randint(0, 120)}",) for _ in range(1200)]
    df = spark.createDataFrame(rows, "k string")
    src = str(tmp_path / "sketch_src")
    df.write.parquet(src)
    stream = spark.readStream.schema("k string").parquet(src)
    assert stream.isStreaming

    q1 = (
        cms_cells_stream(stream, "k", depth=D, width=W)
        .writeStream.format("memory")
        .queryName("cms_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(120)
    got_cms = {
        (r["depth_i"], r["col"]): r["cnt"]
        for r in spark.sql("select * from cms_stream_test").collect()
    }
    want_cms = {
        (r["depth_i"], r["col"]): r["cnt"]
        for r in count_min_cells(df, "k", depth=D, width=W).collect()
    }
    assert got_cms == want_cms

    q2 = (
        hll_registers_stream(stream, "k")
        .writeStream.format("memory")
        .queryName("hll_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got_hll = {
        r["bucket"]: r["rank"]
        for r in spark.sql("select * from hll_stream_test").collect()
    }
    want_hll = {
        r["bucket"]: r["rank"] for r in hll_registers(df, "k").collect()
    }
    assert got_hll == want_hll
