"""S3 Wikipedia XML ingestion: page split/parse, anchor extraction,
redirect closure — semantics per io/WikipediaPageInputFormat.java and
io/ExtractWikipediaAnchorText.java (see sources/wikixml.py docstring)."""

from __future__ import annotations

import pytest

from fel_spark.sources import wikixml

DUMP = """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
  <siteinfo><sitename>Testwiki</sitename></siteinfo>
  <page>
    <title>Alpha City</title>
    <ns>0</ns>
    <id>1</id>
    <revision><id>11</id><text>The [[beta Town|lovely Beta]] lies near
[[Gamma Village#history|gamma]] and [[Delta]] and [[X]] and
[[Alpha City|a]]. Also [[Missing Page|ghost]] links happen, and
[[Epsilon&amp;amp;Co|eps &amp;amp; co]] too.</text></revision>
  </page>
  <page>
    <title>Beta Town</title>
    <ns>0</ns>
    <id>2</id>
    <revision><id>12</id><text>#REDIRECT [[Gamma Village]]</text></revision>
  </page>
  <page>
    <title>Gamma Village</title>
    <ns>0</ns>
    <id>3</id>
    <redirect title="Delta" />
    <revision><id>13</id><text>#REDIRECT [[Delta]]</text></revision>
  </page>
  <page>
    <title>Delta</title>
    <ns>0</ns>
    <id>4</id>
    <revision><id>14</id><text>A real article about [[Alpha City]].</text></revision>
  </page>
  <page>
    <title>Epsilon&amp;Co</title>
    <ns>0</ns>
    <id>5</id>
    <revision><id>15</id><text>Body.</text></revision>
  </page>
  <page>
    <title>Talk:Alpha City</title>
    <ns>1</ns>
    <id>6</id>
    <revision><id>16</id><text>Chatter [[Delta|dd]].</text></revision>
  </page>
</mediawiki>
"""


@pytest.fixture(scope="module")
def dump_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("wiki") / "dump.xml"
    p.write_text(DUMP)
    return str(p)


def test_page_split_and_parse(spark, dump_path):
    pages = wikixml.read_wikipedia_pages(spark, dump_path)
    rows = {r["title"]: r for r in pages.collect()}
    assert len(rows) == 6
    assert rows["Alpha City"]["ns"] == 0 and rows["Alpha City"]["page_id"] == 1
    assert rows["Gamma Village"]["redirect"] == "Delta"  # explicit element
    assert rows["Beta Town"]["redirect"] is None  # markup-only redirect
    assert "#REDIRECT" in rows["Beta Town"]["markup"]
    assert rows["Talk:Alpha City"]["ns"] == 1


def test_redirect_edges_and_closure(spark, dump_path):
    pages = wikixml.read_wikipedia_pages(spark, dump_path)
    edges = {(r["src"], r["dst"]) for r in wikixml.redirect_edges(pages).collect()}
    # markup regex fallback AND explicit element both captured; first char
    # capitalized; fragmentless
    assert ("Beta Town", "Gamma Village") in edges
    assert ("Gamma Village", "Delta") in edges
    resolved = {
        r["src"]: r["dst"]
        for r in wikixml.resolve_redirects(
            wikixml.redirect_edges(pages)
        ).collect()
    }
    # 2-hop chain closes transitively
    assert resolved["Beta Town"] == "Delta"
    assert resolved["Gamma Village"] == "Delta"


def test_redirect_cycle_settles(spark):
    cyc = spark.createDataFrame(
        [("A", "B"), ("B", "A"), ("C", "A")], "src string, dst string"
    )
    out = {r["src"]: r["dst"] for r in wikixml.resolve_redirects(cyc).collect()}
    # 2-cycle members settle on themselves (reference seen-set semantics);
    # the chain INTO the cycle lands on a cycle member
    assert out["A"] == "A" and out["B"] == "B"
    assert out["C"] in {"A", "B"}


def test_anchor_extraction_semantics(spark, dump_path):
    pages = wikixml.read_wikipedia_pages(spark, dump_path)
    anchors = wikixml.extract_anchors(pages).collect()
    got = {(r["target_title"], r["anchor"]) for r in anchors}
    # pipe anchor, normalized (normalize_full lowercases/folds)
    assert ("Delta", "lovely beta") in got  # Beta town -> redirect-resolved to Delta
    # fragment stripped from target; redirect Gamma Village -> Delta
    assert ("Delta", "gamma") in got
    # no-pipe link: anchor == target
    assert ("Delta", "delta") in got
    # single-char anchor dropped (length < 2): [[X]] and [[Alpha City|a]]
    assert not [g for g in got if g[1] in ("x", "a")]
    # ghost target (no such page) dropped by the existing-title join
    assert not [g for g in got if g[0] == "Missing Page"]
    # double-unescape: &amp;amp; -> & in both target and anchor
    assert ("Epsilon&Co", "eps co") in got or ("Epsilon&Co", "eps  co") in got
    # ns!=0 pages contribute no anchors
    srcs = {r["src_title"] for r in anchors}
    assert "Talk:Alpha City" not in srcs
    # redirect pages themselves contribute no anchors
    assert "Beta Town" not in srcs and "Gamma Village" not in srcs


def test_anchors_feed_alias_dict(spark, dump_path):
    """The anchor table is exactly the alias-dict observation shape the
    datapack build consumes (alias=anchor, entity=final target)."""
    from fel_spark.plans.dictionary import build_alias_dict
    from pyspark.sql import functions as F

    pages = wikixml.read_wikipedia_pages(spark, dump_path)
    obs = wikixml.extract_anchors(pages).select(
        F.col("anchor").alias("alias"),
        F.col("target_title").alias("entity_name"),
        F.lit(False).alias("clicked"),
        F.lit(False).alias("from_query"),
    )
    ad, names = build_alias_dict(obs)
    assert ad.count() > 0
    aliases = {r["alias"] for r in ad.collect()}
    assert "lovely beta" in aliases


def test_resolve_redirects_paths_agree(spark, dump_path):
    """Driver fast path (Arrow collect + pandas pointer jump) == the
    distributed pointer-jumping loop on chains, cycles, and chains into
    cycles."""
    cases = [
        wikixml.redirect_edges(wikixml.read_wikipedia_pages(spark, dump_path)),
        spark.createDataFrame(
            [("A", "B"), ("B", "A"), ("C", "A"), ("D", "C"), ("E", "F")],
            "src string, dst string",
        ),
    ]
    for edges in cases:
        fast = {
            (r["src"], r["dst"]) for r in wikixml.resolve_redirects(edges).collect()
        }
        dist = {
            (r["src"], r["dst"])
            for r in wikixml.resolve_redirects(edges, driver_max_edges=0).collect()
        }
        assert fast == dist


def test_resolve_redirects_random_functional_graphs(spark):
    """Fuzz the fast-vs-distributed equivalence on random functional graphs
    (every node at most one out-edge): mixes of chains, 2-cycles, long
    cycles, and trees hanging off cycles — plus targets outside the
    redirect domain."""
    import random

    rng = random.Random(20260818)
    for trial in range(3):
        n = 40
        nodes = [f"n{trial}_{i}" for i in range(n)]
        edges = []
        for i, s in enumerate(nodes):
            # ~20% point outside the domain, rest uniformly at any node
            if rng.random() < 0.2:
                edges.append((s, f"ext{trial}_{rng.randrange(5)}"))
            else:
                edges.append((s, nodes[rng.randrange(n)]))
        df = spark.createDataFrame(edges, "src string, dst string")
        import warnings as W

        with W.catch_warnings():
            W.simplefilter("ignore", RuntimeWarning)
            fast = {
                (r["src"], r["dst"])
                for r in wikixml.resolve_redirects(df, max_iterations=8).collect()
            }
            dist = {
                (r["src"], r["dst"])
                for r in wikixml.resolve_redirects(
                    df, max_iterations=8, driver_max_edges=0
                ).collect()
            }
        assert fast == dist
