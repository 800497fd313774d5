"""Driver-contract checks: entry() smoke + a fast DuckDB-oracle sweep at
sf0.001 for a representative subset (the full sweep runs via
scripts/check_oracle.py at sf0.01)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from fel_spark.sources.testdata import TABLES  # noqa: E402
from scripts.check_oracle import table_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "filter_project",
    "agg_marginal",
    "join_chain",
    "collect_pack",
    "topk_window",
    "doc_token_stats",
    "doc_langid",
    "knn_bruteforce",
    "ann_lsh_md5",
    "ann_ivf_fixed",
    "ann_ivf_recall",
    "ann_lsh_recall",
    "coherence_lattice",
    "wiki_dict_counts",
    "doc_repetition",
    "doc_pii_scrub",
    "events_sessionize",
    "doc_hash_split",
    "doc_span_dup",
    "doc_span_coverage",
    "doc_filter",
    "doc_stratified_sample",
    "doc_pack_chunks",
    "doc_span_excise",
    "doc_containment",
    "media_neardup_md5",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.schema.simpleString() == (
        "struct<mention_id:string,cluster_id:string,cluster_size:bigint>"
    )
    assert df.count() > 0


def test_queries_have_oracles_or_reason():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # all but the explicitly non-SQL-expressible ops have oracles
    assert set(qs) - set(oracles) == {
        "minhash_near_dup",
        "simhash_pairs",
        "dedup_clusters",
        "ann_lsh",
        "ann_ivf",
        "entity_embeddings",
        "media_phash_neardup",  # DCT not SQL-expressible; ground-truth pytest
        "media_audiofp_neardup",  # FFT not SQL-expressible; ground-truth pytest
        "media_videofp_neardup",  # DCT not SQL-expressible; ground-truth pytest
    }


def test_coherence_lattice_clinton_flip(spark):
    """The driver lattice row must encode the reference's canonical
    test.txt behavior: the bare 'clinton' mention node-prefers 'clinton
    park' but coherence flips it onto the SAME entity as the neighboring
    'hillary clinton' mention (CoherentEntityLinkerWrapper.main,
    :126-150)."""
    out = {
        r["mention_id"]: r["entity_id"]
        for r in E.queries()["coherence_lattice"](spark, SF_DIR).collect()
    }
    assert out["m1"] == out["m2"] == 3  # both Clintons -> Hillary Clinton
    assert out["m0"] == 1


def test_ann_recall_values(spark):
    """The driver-gated recall rows must certify real quality, not just
    match the oracle: mean recall@5 over the probe queries >= 0.8 (IVF,
    n_probe=3; observed 0.93) and >= 0.6 (12-plane/4-band LSH; observed
    0.67-0.8) — the gate catches a silent candidate-generation
    regression."""
    for name, floor in (("ann_ivf_recall", 8000), ("ann_lsh_recall", 6000)):
        rows = E.queries()[name](spark, SF_DIR).collect()
        assert len(rows) == 3
        mean = sum(r["recall_4dp"] for r in rows) / len(rows)
        assert mean >= floor, (name, [tuple(r) for r in rows])


def test_no_hugeint_or_decimal_oracle_columns(duck):
    """Every oracle must emit engine-portable column types. DuckDB's
    uncast sum(...) over integers yields HUGEINT, which crosses Arrow as
    decimal128(38,0) -> Python Decimal — the driver's hash normalizer then
    renders Decimal('3') differently from Spark's int 3, producing a
    rows_match/schema_match-green but hash-red row (the conv_integrity
    failure in rounds 3-4). Convention: CAST(sum(...) AS BIGINT). This
    sweep executes every oracle and asserts no HUGEINT/DECIMAL output
    column can ever ship again."""
    offenders = {}
    for name, sql in E.oracle_sql().items():
        rel = duck.sql(sql)
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, [str(t) for t in rel.types])
            if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_subset(spark, duck, name):
    df = E.queries()[name](spark, SF_DIR)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    rel = duck.sql(E.oracle_sql()[name])
    ocols = list(rel.columns)
    orows = rel.fetchall()
    assert sorted(cols) == sorted(ocols)
    assert len(rows) == len(orows)
    assert table_hash(cols, rows) == table_hash(ocols, orows)
