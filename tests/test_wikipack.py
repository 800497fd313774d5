"""End-to-end datapack assembly from a Wikipedia dump: anchors -> counts ->
redirect-resolved targets -> alias dictionary -> linked mentions
(mine-datapack.sh:18-236 + io/Datapack.java:98-213 semantics)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fel_spark.plans import wikipack
from tests.test_wikixml import DUMP


@pytest.fixture(scope="module")
def dump_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("wikipack") / "dump.xml"
    p.write_text(DUMP)
    return str(p)


def test_build_wikipack_counts(spark, dump_path):
    ad, names = wikipack.build_wikipack(spark, dump_path)
    rows = {(r["alias"], r["entity_id"]): r for r in ad.collect()}
    ids = {r["name"]: r["entity_id"] for r in names.collect()}
    # every anchor of the fixture dump accrues to its FINAL (redirect-
    # resolved) target: Beta Town -> Gamma Village -> Delta
    delta = ids["Delta"]
    assert ("lovely beta", delta) in rows
    assert ("gamma", delta) in rows
    assert ("delta", delta) in rows
    # anchor-space semantics: links are corpus events, not query events
    r = rows[("delta", delta)]
    assert r["QAT"] == 0 and r["QAF"] == 0
    assert r["LAF"] == 1 and r["LAET"] == 1
    # Datapack-merge semantics: LAT = corpus phrase frequency >= LAF
    # ("delta" occurs as visible link text in Alpha City's article)
    for row in rows.values():
        assert row["LAT"] >= row["LAF"] >= row["LAET"] >= 0
    # entity marginal sums pair counts
    assert rows[("delta", delta)]["LET"] == sum(
        r["LAET"] for (a, e), r in rows.items() if e == delta
    )


def test_corpus_phrase_counts_visible_text(spark, dump_path):
    """The phrase scan counts VISIBLE text ([[t|a]] -> a, [[t]] -> t), so a
    phrase used twice (once as a link, once as plain words) counts 2."""
    from fel_spark.sources.wikixml import read_wikipedia_pages

    pages = read_wikipedia_pages(spark, dump_path)
    phrases = spark.createDataFrame(
        [("delta",), ("real article",), ("lovely beta",)], ["alias"]
    )
    got = {
        r["alias"]: r["n_corpus"]
        for r in wikipack.corpus_phrase_counts(pages, phrases).collect()
    }
    # "delta" visible once in Alpha City ([[Delta]]); Delta's own page text
    # has no "delta"; redirect pages are excluded from the scan
    assert got["delta"] == 1
    assert got["real article"] == 1  # plain (non-link) text counts too
    assert got["lovely beta"] == 1  # pipe-link visible side


def test_wikipack_links_mentions_end_to_end(spark, dump_path):
    """Dump text -> datapack -> linked mentions: transcripts mentioning the
    dump's aliases resolve to the dump's (redirect-final) entities."""
    from fel_spark.operators.mentions import link_mentions

    ad, names = wikipack.build_wikipack(spark, dump_path)
    ents = wikipack.wiki_entities(names)
    ids = {r["name"]: r["entity_id"] for r in names.collect()}
    t = spark.createDataFrame(
        [
            ("c1", 0, "user", "tell me about lovely beta today", "", None),
            ("c1", 1, "assistant", "the delta area is nearby", "", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    mentions = link_mentions(t, ad, ents).collect()
    by_span = {r["span"]: r["entity_id"] for r in mentions}
    assert by_span.get("lovely beta") == ids["Delta"]
    assert by_span.get("delta") == ids["Delta"]


def test_vocab_broadcast_gate(spark, dump_path):
    """The vocabulary broadcast is GATED, not unconditional (the TF-IDF
    lesson): under FEL's datapack bound the phrase join broadcast-hints
    (no shuffle of the corpus span stream); past the bound the hint is
    dropped and AQE owns the join."""
    from fel_spark.sources.wikixml import read_wikipedia_pages

    pages = read_wikipedia_pages(spark, dump_path)
    ad, _names = wikipack.build_wikipack(spark, dump_path, corpus_counts=False)
    vocab = ad.select("alias")

    # fixture-scale vocabulary passes the gate; a 1-byte bound fails it
    assert wikipack.vocab_broadcastable(vocab)
    assert not wikipack.vocab_broadcastable(vocab, max_bytes=1)

    # gate passed -> broadcast join, corpus side never exchanges
    plan_bc = wikipack.corpus_phrase_counts(
        pages, vocab, broadcast_vocab=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_bc

    # gate failed -> no broadcast HINT in the optimized logical plan (AQE
    # may still choose broadcast from runtime stats — that's the point)
    plan_no = wikipack.corpus_phrase_counts(
        pages, vocab, broadcast_vocab=False
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in plan_no and "hints=[broadcast]" not in plan_no

    # and the auto path (None) equals the gate's decision at this scale
    plan_auto = wikipack.corpus_phrase_counts(
        pages, vocab
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_auto
