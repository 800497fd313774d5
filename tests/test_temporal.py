"""Temporal linkage: decayed agreement/disagreement evidence."""

from __future__ import annotations

from pyspark.sql import functions as F

from fel_spark.operators.temporal import decay_micro, temporal_pair_scores


def _obs(spark, rows):
    return spark.createDataFrame(rows, ["rid", "bk", "val", "ts_sec"])


def test_decay_exact_integer_ramp(spark):
    df = spark.range(1).select(
        decay_micro(F.lit(0), 100).alias("d0"),
        decay_micro(F.lit(25), 100).alias("d25"),
        decay_micro(F.lit(99), 100).alias("d99"),
        decay_micro(F.lit(100), 100).alias("d100"),
        decay_micro(F.lit(1000), 100).alias("dfar"),
    )
    r = df.collect()[0]
    assert (r["d0"], r["d25"], r["d99"], r["d100"], r["dfar"]) == (
        1_000_000,
        750_000,
        10_000,
        0,
        0,
    )


def test_temporal_scores_agree_and_disagree(spark):
    obs = _obs(
        spark,
        [
            (1, 0, "click", 0),
            (2, 0, "click", 50),  # agree, gap 50
            (3, 0, "error", 10),  # disagrees with 1 at gap 10, with 2 at 40
            (9, 1, "click", 0),  # other block: no pairs across
        ],
    )
    got = {
        (r["id_a"], r["id_b"]): (r["agree"], r["gap_sec"], r["score_micro"])
        for r in temporal_pair_scores(obs, 100, 20).collect()
    }
    assert got[(1, 2)] == (True, 50, 500_000)
    # close disagreement: strong negative (gap 10 of 20 window)
    assert got[(1, 3)] == (False, 10, -500_000)
    # disagreement past its window: decayed to exactly 0
    assert got[(2, 3)] == (False, 40, 0)
    assert len(got) == 3


def test_disagreement_decays_faster_than_agreement(spark):
    """The Li et al. asymmetry: at the same gap, an old conflict counts
    for less than an old agreement."""
    obs = _obs(
        spark,
        [
            (1, 0, "a", 0),
            (2, 0, "a", 60),
            (3, 0, "b", 60),
        ],
    )
    got = {
        (r["id_a"], r["id_b"]): r["score_micro"]
        for r in temporal_pair_scores(obs, 200, 80).collect()
    }
    assert got[(1, 2)] == 700_000  # 1 - 60/200
    assert got[(1, 3)] == -250_000  # -(1 - 60/80)
    assert abs(got[(1, 3)]) < got[(1, 2)]


def test_null_value_is_disagreement_and_plan_shape(spark):
    obs = spark.createDataFrame(
        [(1, 0, None, 0), (2, 0, "x", 5)],
        "rid long, bk long, val string, ts_sec long",
    )
    out = temporal_pair_scores(obs, 100, 50)
    r = out.collect()[0]
    assert r["agree"] is False and r["score_micro"] == -900_000
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # pure column math, no UDF


# ---------------------------------------------------------------------------
# SCD2 value intervals


def test_value_intervals_runs_and_currency(spark):
    from fel_spark.operators.temporal import value_intervals

    # entity 1: a -> b -> a (three runs; the value RECURS — set-based
    # grouping would wrongly merge run 1 and 3); entity 2: constant.
    rows = [
        (1, "a", 10), (1, "a", 20), (1, "b", 30), (1, "a", 40),
        (2, "x", 5), (2, "x", 15),
    ]
    df = spark.createDataFrame(rows, "eid long, v string, ts long")
    got = sorted(
        (
            r["entity"], r["value"], r["valid_from"], r["valid_to"],
            r["n_obs"], r["is_current"],
        )
        for r in value_intervals(df, "eid", "v", "ts").collect()
    )
    assert got == [
        (1, "a", 10, 30, 2, 0),
        (1, "a", 40, None, 1, 1),
        (1, "b", 30, 40, 1, 0),
        (2, "x", 5, None, 2, 1),
    ]


def test_value_intervals_replay_fuzz(spark):
    import random

    from fel_spark.operators.temporal import value_intervals

    def py_intervals(obs):
        out = []
        by_e = {}
        for e, v, ts in obs:
            by_e.setdefault(e, []).append((ts, v))
        for e, rows_ in by_e.items():
            rows_.sort()
            runs = []
            for ts, v in rows_:
                if runs and runs[-1][0] == v:
                    runs[-1][2] += 1
                else:
                    runs.append([v, ts, 1])
            for i, (v, start, n) in enumerate(runs):
                nxt = runs[i + 1][1] if i + 1 < len(runs) else None
                out.append(
                    (e, v, start, nxt, n, 1 if nxt is None else 0)
                )
        return sorted(out)

    rng = random.Random(167)
    obs = []
    used = set()
    for e in range(5):
        for _ in range(rng.randint(1, 15)):
            ts = rng.randint(0, 1000)
            while (e, ts) in used:  # unique ts per entity: total order
                ts = rng.randint(0, 1000)
            used.add((e, ts))
            obs.append((e, rng.choice("pq"), ts))
    df = spark.createDataFrame(obs, "eid long, v string, ts long")
    got = sorted(
        (
            r["entity"], r["value"], r["valid_from"], r["valid_to"],
            r["n_obs"], r["is_current"],
        )
        for r in value_intervals(df, "eid", "v", "ts").collect()
    )
    assert got == py_intervals(obs)
