"""spark-submit --py-files launch surface (north_rule: "launched via
spark-submit --py-files on multi-executor clusters")."""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str | None:
    return shutil.which("spark-submit") or (
        "/opt/spark/bin/spark-submit"
        if Path("/opt/spark/bin/spark-submit").exists()
        else None
    )


def test_package_pyfiles_zip_contains_package(tmp_path):
    sys.path.insert(0, str(REPO / "scripts"))
    import package_pyfiles

    out = package_pyfiles.build(tmp_path / "fel_spark.zip")
    import zipfile

    names = zipfile.ZipFile(out).namelist()
    assert "fel_spark/session.py" in names
    assert "fel_spark/plans/pipeline.py" in names
    assert all(n.startswith("fel_spark/") for n in names)


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit on PATH")
def test_spark_submit_pyfiles_end_to_end():
    """The production launch path actually runs: package the lib, submit the
    ER job with --py-files on a fresh JVM, read the result back."""
    sys.path.insert(0, str(REPO / "scripts"))
    import package_pyfiles

    zip_path = package_pyfiles.build()
    with tempfile.TemporaryDirectory() as td:
        run_dir, out_dir = f"{td}/run", f"{td}/out"
        proc = subprocess.run(
            [
                _spark_submit(),
                "--master",
                "local[4]",
                "--conf",
                "spark.sql.shuffle.partitions=8",
                "--conf",
                "spark.ui.enabled=false",
                "--py-files",
                str(zip_path),
                str(REPO / "scripts" / "submit_er.py"),
                "--synth",
                "150",
                "--run-dir",
                run_dir,
                "--output",
                out_dir,
            ],
            capture_output=True,
            text=True,
            timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        res = json.loads(line)
        assert res["mentions"] > 0
        # resumability artifacts: stage manifests + per-partition lineage
        assert (Path(run_dir) / "linked_mentions" / "_STAGE_SUCCESS").exists()
        assert (Path(run_dir) / "_metrics").exists()


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit on PATH")
def test_spark_submit_corpus_prep_end_to_end():
    """The corpus-prep job launches the same way: --py-files zip, fresh JVM,
    resumable run dir, packed manifest partitioned by split."""
    sys.path.insert(0, str(REPO / "scripts"))
    import package_pyfiles

    zip_path = package_pyfiles.build()
    with tempfile.TemporaryDirectory() as td:
        run_dir, out_dir = f"{td}/run", f"{td}/out"
        proc = subprocess.run(
            [
                _spark_submit(),
                "--master",
                "local[4]",
                "--conf",
                "spark.sql.shuffle.partitions=8",
                "--conf",
                "spark.ui.enabled=false",
                "--py-files",
                str(zip_path),
                str(REPO / "scripts" / "submit_corpus.py"),
                "--input",
                "/root/testdata/sf0.001/documents.parquet",
                "--run-dir",
                run_dir,
                "--output",
                out_dir,
                "--pack-budget",
                "512",
                "--pack-shards",
                "4",
            ],
            capture_output=True,
            text=True,
            timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        res = json.loads(line)
        assert res["docs_packed"] > 0 and "train" in res["split_counts"]
        assert (Path(run_dir) / "packed" / "_STAGE_SUCCESS").exists()
        assert (Path(run_dir) / "_aux" / "filter_audit").exists()
        # split-partitioned output: per-split directories exist
        assert any(p.name.startswith("split=") for p in Path(out_dir).iterdir())


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit on PATH")
def test_spark_submit_record_linkage_end_to_end():
    """The unsupervised record-linkage job launches the same way:
    --py-files zip, fresh JVM, resumable run dir with the trained model
    artifact, cluster-assignment output."""
    sys.path.insert(0, str(REPO / "scripts"))
    import package_pyfiles

    zip_path = package_pyfiles.build()
    with tempfile.TemporaryDirectory() as td:
        run_dir, out_dir = f"{td}/run", f"{td}/out"
        proc = subprocess.run(
            [
                _spark_submit(),
                "--master",
                "local[4]",
                "--conf",
                "spark.sql.shuffle.partitions=8",
                "--conf",
                "spark.ui.enabled=false",
                "--py-files",
                str(zip_path),
                str(REPO / "scripts" / "submit_linkage.py"),
                "--input",
                "/root/testdata/sf0.001/documents.parquet",
                "--id-col",
                "doc_id",
                "--name-from-text",
                "--run-dir",
                run_dir,
                "--output",
                out_dir,
                "--em-iters",
                "3",
                "--clusterer",
                "pivot",
            ],
            capture_output=True,
            text=True,
            timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        res = json.loads(line)
        assert res["records"] > 0 and res["clusters"] > 0
        assert res["clusters"] <= res["records"]
        assert res["clusterer"] == "pivot"
        assert (Path(run_dir) / "clusters" / "_STAGE_SUCCESS").exists()
        assert (Path(run_dir) / "fs_model.json").exists()
        assert (Path(run_dir) / "_aux" / "phonetic_audit").exists()
        assert (Path(run_dir) / "_aux" / "cluster_audit").exists()
        assert (Path(run_dir) / "_aux" / "corr_objective").exists()
