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
