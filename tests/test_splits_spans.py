"""Dataset splitting + span-level dedup (scale path: xxhash64 defaults).

The md5 oracle variants are value-checked by the driver gate
(doc_hash_split / doc_span_dup / doc_span_coverage); these tests pin the
xxhash64 scale path's semantics: determinism under repartitioning,
realized fractions, map-only plan, and exact span accounting on a corpus
with known duplicated windows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fel_spark.operators.dedup import duplicated_spans, span_coverage
from fel_spark.operators.splits import hash_split, split_counts


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(17, "doc_id")).collect()
    }
    assert a == b
    counts = {r["split"]: r["n"] for r in split_counts(hash_split(df)).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] + counts["val"] + counts["test"] == 5000
    # realized fractions within ~2 sigma of 0.90/0.05/0.05 on 5000 ids
    assert abs(counts["train"] / 5000 - 0.90) < 0.02
    assert abs(counts["val"] / 5000 - 0.05) < 0.02


def test_hash_split_is_map_only(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = hash_split(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, weights=(("train", 0.5), ("test", 0.4)))


def _span_docs(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"{shared} one two three"),
        (2, f"zero {shared} four five"),
        (3, "totally different words with no repeated window here ok"),
        (4, "short doc"),  # < 8 tokens: contributes no spans
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_duplicated_spans_exact(spark):
    d = _span_docs(spark)
    hot = duplicated_spans(d, window=8, min_docs=2).collect()
    # exactly ONE 8-token window is shared verbatim between docs 1 and 2
    assert len(hot) == 1
    assert hot[0]["n_docs"] == 2 and hot[0]["n_occurrences"] == 2


def test_span_coverage_exact(spark):
    d = _span_docs(spark)
    cov = {r["doc_id"]: r for r in span_coverage(d, window=8, min_docs=2).collect()}
    # docs 1 and 2: 11 tokens -> 4 windows each, 1 duplicated (the shared
    # 8-token run); doc 3: 9 tokens -> 2 windows, 0 duplicated
    assert set(cov) == {1, 2, 3}  # doc 4 has no windows
    assert (cov[1]["n_spans"], cov[1]["n_dup_spans"]) == (4, 1)
    assert (cov[2]["n_spans"], cov[2]["n_dup_spans"]) == (4, 1)
    assert (cov[3]["n_spans"], cov[3]["n_dup_spans"]) == (2, 0)
    assert cov[1]["dup_coverage"] == pytest.approx(0.25)


def test_span_ops_single_scan_no_pair_explosion(spark):
    """duplicated_spans is explode + ONE hash aggregate — no join in the
    plan (the scale contract: linear in token count, never pairs)."""
    d = _span_docs(spark)
    plan = (
        duplicated_spans(d, window=8)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
