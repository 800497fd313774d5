from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from fel_spark.operators.asof import asof_join


def _random_frames(seed: int, n_probe: int = 400, n_ref: int = 120):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    probe = pd.DataFrame(
        {
            "pid": np.arange(n_probe),
            "k": rng.integers(0, 6, n_probe),
            "ts": base + pd.to_timedelta(rng.integers(0, 10_000, n_probe), unit="s"),
            "x": rng.normal(size=n_probe).round(3),
        }
    )
    ref = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_ref),  # some keys absent from probe side
            "ts": base + pd.to_timedelta(rng.integers(0, 10_000, n_ref), unit="s"),
            "v": rng.normal(size=n_ref).round(3),
            "seq": np.arange(n_ref),
        }
    )
    # plant duplicate (k, ts) reference rows to exercise ref_seq_col
    dup = ref.head(10).copy()
    dup["v"] = dup["v"] + 100.0
    dup["seq"] = dup["seq"] + n_ref
    return probe, pd.concat([ref, dup], ignore_index=True)


def _expected(probe: pd.DataFrame, ref: pd.DataFrame, direction: str, tol_us: int | None):
    r = (
        ref.sort_values("seq")
        .groupby(["k", "ts"], as_index=False)
        .last()  # highest seq wins, mirroring ref_seq_col
        .sort_values("ts")
    )
    tol = pd.Timedelta(microseconds=tol_us) if tol_us is not None else None
    out = pd.merge_asof(
        probe.sort_values("ts"),
        r[["k", "ts", "v"]].rename(columns={"ts": "asof_ts", "v": "asof_v"}),
        left_on="ts",
        right_on="asof_ts",
        by="k",
        direction=direction,
        tolerance=tol,
        allow_exact_matches=True,
    )
    return out.sort_values("pid").reset_index(drop=True)


@pytest.mark.parametrize("direction,tol_us", [
    ("backward", None),
    ("backward", 900 * 1_000_000),
    ("forward", None),
    ("forward", 600 * 1_000_000),
])
def test_asof_join_matches_pandas_merge_asof(spark, direction, tol_us):
    probe_pd, ref_pd = _random_frames(seed=3)
    probe = spark.createDataFrame(probe_pd).repartition(5)
    ref = spark.createDataFrame(ref_pd).repartition(3)
    got = (
        asof_join(
            probe,
            ref,
            keys=["k"],
            ts_col="ts",
            value_cols=["v"],
            direction=direction,
            tolerance_us=tol_us,
            ref_seq_col="seq",
        )
        .toPandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    want = _expected(probe_pd, ref_pd, direction, tol_us)
    assert list(got["pid"]) == list(want["pid"])
    pd.testing.assert_series_equal(
        got["asof_ts"].astype("datetime64[ns]"),
        want["asof_ts"].astype("datetime64[ns]"),
        check_names=False,
    )
    pd.testing.assert_series_equal(
        got["asof_v"], want["asof_v"], check_names=False, check_dtype=False
    )


def test_asof_inclusive_at_equal_ts(spark):
    ts = pd.Timestamp("2024-01-01 12:00:00")
    probe = spark.createDataFrame(pd.DataFrame({"pid": [1], "k": [0], "ts": [ts]}))
    ref = spark.createDataFrame(pd.DataFrame({"k": [0], "ts": [ts], "v": [7.5]}))
    row = asof_join(probe, ref, keys=["k"], value_cols=["v"]).collect()[0]
    assert row.asof_v == 7.5
    fwd = asof_join(probe, ref, keys=["k"], value_cols=["v"], direction="forward").collect()[0]
    assert fwd.asof_v == 7.5


def test_asof_single_shuffle_plan(spark):
    """The union+window shape shuffles ONCE (plus the optional ref dedup);
    without ref_seq_col the whole plan has exactly one Exchange."""
    probe_pd, ref_pd = _random_frames(seed=5)
    ref_pd = ref_pd.drop_duplicates(["k", "ts"])
    probe = spark.createDataFrame(probe_pd)
    ref = spark.createDataFrame(ref_pd)
    out = asof_join(probe, ref, keys=["k"], value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
