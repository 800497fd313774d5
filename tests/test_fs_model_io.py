"""FS model persistence + waterfall explanation."""

from __future__ import annotations

import pytest

from fel_spark.operators.linkage import (
    fs_explain,
    fs_score,
    fs_weights,
    fs_weights_multilevel,
    load_fs_model,
    save_fs_model,
)

FEATS = ["f1", "f2"]


def _pairs(spark):
    rows = [
        (1, 2, 1, 1, 1),
        (1, 3, 1, 0, 1),
        (2, 3, 0, 1, 0),
        (1, 4, 0, 0, 0),
    ]
    return spark.createDataFrame(
        rows, "id_a long, id_b long, f1 long, f2 long, is_match long"
    )


def test_fs_model_roundtrip_binary(spark, tmp_path):
    w = fs_weights(_pairs(spark), FEATS)
    path = str(tmp_path / "model.json")
    save_fs_model(w, path)
    back = load_fs_model(spark, path)
    assert back.schema == w.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, w.collect())
    )


def test_fs_model_roundtrip_scores_identically(spark, tmp_path):
    df = _pairs(spark)
    w = fs_weights(df, FEATS)
    path = str(tmp_path / "model.json")
    save_fs_model(w, path)
    orig = sorted(map(tuple, fs_score(df, w, FEATS).collect()))
    loaded = sorted(
        map(tuple, fs_score(df, load_fs_model(spark, path), FEATS).collect())
    )
    assert orig == loaded


def test_fs_model_roundtrip_multilevel(spark, tmp_path):
    df = _pairs(spark)  # f1 in {0,1} as a 2-level feature
    w = fs_weights_multilevel(df, {"f1": 2, "f2": 2})
    path = str(tmp_path / "ml.json")
    save_fs_model(w, path)
    back = load_fs_model(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, w.collect())
    )


def test_fs_model_version_gate(spark, tmp_path):
    import json

    path = str(tmp_path / "bad.json")
    with open(path, "w") as f:
        json.dump({"fs_model_version": 99, "schema": "{}", "rows": []}, f)
    with pytest.raises(ValueError, match="fs_model_version"):
        load_fs_model(spark, path)


def test_fs_explain_cumulative_equals_score(spark):
    df = _pairs(spark)
    w = fs_weights(df, FEATS)
    total = {
        (r["id_a"], r["id_b"]): r["fs_score_micro"]
        for r in fs_score(df, w, FEATS).collect()
    }
    rows = fs_explain(df.drop("is_match"), w, FEATS).collect()
    # declared order: f1 then f2; last cumulative == fs_score total
    by_pair = {}
    for r in rows:
        by_pair.setdefault((r["id_a"], r["id_b"]), []).append(r)
    for pair, prs in by_pair.items():
        prs.sort(key=lambda r: FEATS.index(r["feature"]))
        assert [r["feature"] for r in prs] == FEATS
        assert prs[0]["cum_score_micro"] == prs[0]["w_micro"]
        assert prs[-1]["cum_score_micro"] == total[pair]
        assert (
            prs[1]["cum_score_micro"]
            == prs[0]["w_micro"] + prs[1]["w_micro"]
        )
