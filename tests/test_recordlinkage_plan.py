"""End-to-end unsupervised record-linkage plan: planted-duplicate
recovery, invariants, resumability."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from fel_spark.plans.recordlinkage import run_record_linkage

BASE_NAMES = [
    "jonathan meyer", "katherine johnson", "robert ashcraft",
    "margaret thompson", "william rodriguez", "elizabeth carter",
    "christopher nolan", "alexandra petrov", "benjamin franklin",
    "stephanie wu", "frederick douglass", "veronica salt",
    "maximilian stern", "gabriella fonseca", "theodore roosevelt",
    "penelope cruz", "sebastian vettel", "anastasia romanov",
    "montgomery burns", "clementine kruczynski",
]


def _perturb(rng, name):
    """One realistic typo: adjacent transposition, vowel swap, or drop."""
    chars = list(name)
    kind = rng.randrange(3)
    idx = rng.randrange(1, len(chars) - 1)
    if kind == 0:
        chars[idx], chars[idx - 1] = chars[idx - 1], chars[idx]
    elif kind == 1 and chars[idx] in "aeiou":
        chars[idx] = rng.choice("aeiou")
    else:
        del chars[idx]
    return "".join(chars)


@pytest.fixture(scope="module")
def planted(spark):
    """3 records per latent entity (1 clean + 2 perturbed), ids encode
    the gold entity: gold = record_id // 10."""
    rng = random.Random(99)
    rows = []
    for e, name in enumerate(BASE_NAMES):
        rows.append((e * 10, name))
        rows.append((e * 10 + 1, _perturb(rng, name)))
        rows.append((e * 10 + 2, _perturb(rng, name)))
    return spark.createDataFrame(rows, "record_id long, name string")


def test_plan_recovers_planted_entities(spark, planted, tmp_path):
    out = run_record_linkage(
        spark, str(tmp_path / "run"), planted
    ).collect()
    assert len(out) == planted.count()  # every record assigned
    clusters = {}
    for r in out:
        clusters.setdefault(r["cluster_id"], []).append(r["record_id"])
    # pairwise precision/recall vs gold = record_id // 10
    tp = fp = 0
    for members in clusters.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                if a // 10 == b // 10:
                    tp += 1
                else:
                    fp += 1
    total_true = len(BASE_NAMES) * 3  # C(3,2) per entity
    prec = tp / max(tp + fp, 1)
    rec = tp / total_true
    assert prec >= 0.95, (prec, rec)
    assert rec >= 0.8, (prec, rec)


def test_plan_is_resumable_and_stable(spark, planted, tmp_path):
    run_dir = str(tmp_path / "run2")
    first = sorted(
        map(tuple, run_record_linkage(spark, run_dir, planted).collect())
    )
    # second invocation must resume (all stages done) and return the
    # identical assignment from the snapshots
    second = sorted(
        map(tuple, run_record_linkage(spark, run_dir, planted).collect())
    )
    assert first == second
    import os

    assert os.path.exists(os.path.join(run_dir, "fs_model.json"))
    for stage in ("pairs", "features", "model", "scored", "clusters",
                  "golden"):
        assert os.path.exists(os.path.join(run_dir, stage, "_STAGE_SUCCESS"))


def test_plan_golden_records_pick_canonical_names(spark, planted, tmp_path):
    run_dir = str(tmp_path / "run3")
    run_record_linkage(spark, run_dir, planted)
    golden = spark.read.parquet(f"{run_dir}/golden")
    rows = golden.collect()
    assert len(rows) >= 1
    # every golden name is one of the observed surface forms
    observed = {r["name"] for r in planted.collect()}
    assert all(r["name"] in observed for r in rows)


def test_plan_clusterer_variants(spark, planted, tmp_path):
    """star and pivot decision layers: every record assigned, pairwise
    precision at least as good as CC's bar (radius-1 clusters cannot
    chain), and the corr_objective aux snapshot lands."""
    for clusterer in ("star", "pivot", "mc", "lpa", "mcl"):
        run_dir = str(tmp_path / f"run_{clusterer}")
        out = run_record_linkage(
            spark, run_dir, planted, clusterer=clusterer
        ).collect()
        assert len(out) == planted.count(), clusterer
        clusters = {}
        for r in out:
            clusters.setdefault(r["cluster_id"], []).append(r["record_id"])
        tp = fp = 0
        for members in clusters.values():
            for i, a in enumerate(members):
                for b in members[i + 1:]:
                    if a // 10 == b // 10:
                        tp += 1
                    else:
                        fp += 1
        prec = tp / max(tp + fp, 1)
        assert prec >= 0.95, (clusterer, prec)
        # radius-1 layers trade recall for chain resistance; on this
        # clean planted corpus they must still recover most pairs
        rec = tp / (len(BASE_NAMES) * 3)
        assert rec >= 0.6, (clusterer, rec)
        import os

        assert os.path.exists(
            os.path.join(run_dir, "_aux", "corr_objective")
        ), clusterer


def test_plan_rejects_unknown_clusterer(spark, planted, tmp_path):
    with pytest.raises(ValueError):
        run_record_linkage(
            spark, str(tmp_path / "bad"), planted, clusterer="agglo"
        )


def test_candidate_pairs_blocksplit_equals_plain(spark, planted):
    """The pairgen strategies must produce the IDENTICAL candidate set —
    BlockSplit changes only the physical balance, never the pairs."""
    from fel_spark.plans.recordlinkage import _candidate_pairs

    records = planted
    plain = {
        (r["id_a"], r["id_b"], tuple(r["rules"]))
        for r in _candidate_pairs(
            records, "record_id", "name", snm_window=4, pairgen="plain"
        ).collect()
    }
    split = {
        (r["id_a"], r["id_b"], tuple(r["rules"]))
        for r in _candidate_pairs(
            records,
            "record_id",
            "name",
            snm_window=4,
            pairgen="blocksplit",
            max_block=5,
        ).collect()
    }
    assert plain == split
