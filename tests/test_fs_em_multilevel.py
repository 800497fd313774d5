"""Multi-level FS EM: planted-structure recovery without labels +
simplex/invariance properties."""

from __future__ import annotations

import random

from fel_spark.operators.linkage import fs_em_train_multilevel

LEVELS = {"lv_a": 3, "lv_b": 2}


def _planted(spark, n=4000, lam=0.3, seed=13):
    """Latent match class draws high agreement levels; non-matches draw
    low ones. EM should recover the level distributions label-free."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        match = rng.random() < lam
        if match:
            a = rng.choices([0, 1, 2], weights=[5, 15, 80])[0]
            b = rng.choices([0, 1], weights=[10, 90])[0]
        else:
            a = rng.choices([0, 1, 2], weights=[70, 25, 5])[0]
            b = rng.choices([0, 1], weights=[85, 15])[0]
        rows.append((i, i + n, a, b))
    return spark.createDataFrame(
        rows, "id_a long, id_b long, lv_a long, lv_b long"
    )


def test_em_multilevel_recovers_planted_structure(spark):
    out = fs_em_train_multilevel(_planted(spark), LEVELS, iters=8)
    rows = {(r["feature"], r["level"]): r for r in out.collect()}
    lam = rows[("lv_a", 0)]["lambda_micro"] / 1e6
    assert 0.2 < lam < 0.4  # planted 0.3
    # match class concentrates on the top level; non-match on the bottom
    assert rows[("lv_a", 2)]["m_micro"] > 600_000
    assert rows[("lv_a", 0)]["m_micro"] < 200_000
    assert rows[("lv_a", 0)]["u_micro"] > 500_000
    assert rows[("lv_b", 1)]["m_micro"] > 700_000
    assert rows[("lv_b", 1)]["u_micro"] < 400_000


def test_em_multilevel_outputs_are_simplexes(spark):
    out = fs_em_train_multilevel(_planted(spark, n=800), LEVELS, iters=4)
    rows = out.collect()
    for feat, nl in LEVELS.items():
        for col in ("m_micro", "u_micro"):
            s = sum(r[col] for r in rows if r["feature"] == feat)
            assert abs(s - 1_000_000) <= nl  # micro rounding slack
    lams = {r["lambda_micro"] for r in rows}
    assert len(lams) == 1  # one shared lambda, self-describing rows


def test_em_multilevel_partition_invariant(spark):
    df = _planted(spark, n=600)
    a = sorted(map(tuple, fs_em_train_multilevel(df, LEVELS, 3).collect()))
    b = sorted(
        map(
            tuple,
            fs_em_train_multilevel(df.repartition(13), LEVELS, 3).collect(),
        )
    )
    assert a == b  # histogram aggregate is partition-invariant
