"""S3: distributed Wikipedia XML dump ingestion, Spark-first.

Re-expresses the reference's Hadoop ingestion stack:

- page record splitting  `io/WikipediaPageInputFormat.java:1-88` (Cloud9
  XMLInputFormat splitting the dump on <page> boundaries). Spark analogue:
  ``spark.read.option("lineSep", "</page>").text(path)`` — the DataFrame
  text source splits the (possibly multi-file) dump into one record per
  page at parallel split boundaries, no custom InputFormat needed.
- page parsing + redirect detection
  `io/ExtractWikipediaAnchorText.java:92-126`: the ``#REDIRECT [[target]]``
  markup regex (case-insensitive), '#fragment' strip, first-char
  capitalization, self-redirect drop. Dumps also carry an explicit
  ``<redirect title=.../>`` element — honored first, markup regex as the
  fallback (the reference only had the markup).
- anchor extraction `ExtractWikipediaAnchorText.java:150-182`:
  ``[[target|anchor]]`` links; anchor = target when no pipe; anchor is
  double-HTML-unescaped + punctuation/diacritics-folded
  (`PunctuationDiacriticsFolder` == functions.text.normalize_full) and
  dropped when shorter than 2 chars; target is double-unescaped, trimmed,
  first-char-capitalized; anchors only count toward EXISTING ns=0 titles
  (the reference's (title,0)/(title,1) secondary-sort join == a plain join
  against the page-title set here).
- redirect transitive closure `ExtractWikipediaAnchorText.java:265-295`
  (driver while-loop with a seen-set): here a pointer-jumping DataFrame
  loop — dst <- mapping(dst) with the mapping SQUARED each round, so an
  L-hop chain resolves in O(log L) joins. Acyclic chains (the real case)
  match the reference exactly; cycle members settle deterministically on
  themselves for 2-cycles (same as the reference) and on an
  iteration-parity member for longer cycles (the reference's answer there
  depends on the traversal start, so no canonical answer exists).

Everything stays DataFrame-shaped: the parse is one mapInPandas over the
page records (stdlib ElementTree, same pattern as sources/evalxml.py), the
anchor pipeline is native column expressions, and the closure is the same
checkpointed-join shape as operators/cluster.py.
"""

from __future__ import annotations

import warnings
from collections.abc import Iterator
from xml.etree import ElementTree as ET

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from fel_spark.functions.text import normalize_full

PAGE_SCHEMA = "title string, ns int, page_id long, redirect string, markup string"

# the reference's redirect markup regex (ExtractWikipediaAnchorText.java:92)
_REDIRECT_RE = r"(?is)^\s*#redirect[:\s]*\[\[([^\]]*)\]\]"


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def read_wikipedia_pages(spark: SparkSession, path: str) -> DataFrame:
    """Dump file(s) -> (title, ns, page_id, redirect, markup).

    ``lineSep="</page>"`` gives one text record per page (split-parallel
    across files and within large files); each record re-closes its tag and
    parses with stdlib ElementTree inside mapInPandas — no driver-side I/O,
    no custom InputFormat.
    """
    return parse_page_fragments(spark.read.option("lineSep", "</page>").text(path))


def parse_page_fragments(fragments: DataFrame) -> DataFrame:
    """One-column (``value``) DataFrame of ``</page>``-less page fragments
    -> (title, ns, page_id, redirect, markup). The parse half of
    :func:`read_wikipedia_pages`, factored so in-memory page records (test
    fixtures, oracle replays) run the identical ElementTree path as dump
    files."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for frag in pdf["value"]:
                if frag is None:
                    continue
                i = frag.find("<page")
                if i < 0:
                    continue
                try:
                    el = ET.fromstring(frag[i:] + "</page>")
                except ET.ParseError:
                    continue
                title = ns = page_id = redirect = markup = None
                for child in el:
                    tag = _strip_ns(child.tag)
                    if tag == "title":
                        title = child.text or ""
                    elif tag == "ns":
                        ns = int(child.text or 0)
                    elif tag == "id" and page_id is None:
                        page_id = int(child.text or 0)
                    elif tag == "redirect":
                        redirect = child.get("title")
                    elif tag == "revision":
                        for rc in child:
                            if _strip_ns(rc.tag) == "text":
                                markup = rc.text or ""
                rows.append((title or "", ns or 0, page_id, redirect, markup or ""))
            yield pd.DataFrame(
                rows, columns=["title", "ns", "page_id", "redirect", "markup"]
            )

    return fragments.mapInPandas(gen, schema=PAGE_SCHEMA)


def _capitalize_first(col):
    """capitalizeFirstChar (titles are case-insensitive on the initial
    character, ExtractWikipediaAnchorText.java:158-161)."""
    return F.concat(F.upper(F.substring(col, 1, 1)), col.substr(F.lit(2), F.length(col)))


def _unescape_html(col):
    """The common HTML entities the reference's double StringEscapeUtils
    unescape resolves in dump markup; applied twice by callers to mirror
    the double-unescape (&amp;amp; -> &amp; -> &)."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#0?39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # LAST: so &amp;lt; needs the second pass, as in Java
    ):
        out = F.regexp_replace(out, ent, ch)
    return out


def redirect_edges(pages: DataFrame) -> DataFrame:
    """(src, dst) redirect pairs: explicit <redirect> element first, the
    reference's markup regex as fallback; '#fragment' stripped, first char
    capitalized, self-redirects dropped (:112-126)."""
    target = F.coalesce(
        F.col("redirect"), F.nullif(F.regexp_extract("markup", _REDIRECT_RE, 1), F.lit(""))
    )
    target = _unescape_html(_unescape_html(target))
    target = F.trim(F.regexp_replace(target, "#.*$", ""))
    target = _capitalize_first(target)
    src = _capitalize_first(F.col("title"))
    return (
        pages.select(src.alias("src"), target.alias("dst"))
        .filter(F.col("dst").isNotNull() & (F.length("dst") > 0))
        .filter(F.col("src") != F.col("dst"))
    )


DRIVER_REDIRECT_MAX_EDGES = 2_000_000


def resolve_redirects(
    redirects: DataFrame,
    max_iterations: int = 10,
    driver_max_edges: int = DRIVER_REDIRECT_MAX_EDGES,
) -> DataFrame:
    """(src, dst) -> (src, final): pointer-jumping closure of the redirect
    chain (the reference's while-loop over an in-memory map, :277-295,
    distributed). The mapping squares each round, so chains of length up to
    2^max_iterations resolve; rows stop jumping once dst == src (cycle
    fixpoint) or dst leaves the redirect domain.

    Small maps (below ``driver_max_edges`` — the full English Wikipedia
    redirect set is ~10M rows, corpus-scale dumps go distributed) take a
    driver fast path: one Arrow collect + vectorized pandas pointer
    jumping, replacing per-iteration checkpoint+count jobs whose driver
    latency dominates at dictionary scale (the same gate rationale as
    `operators/cluster.connected_components`). Same fixpoint semantics,
    equality-tested in test_wikixml.py."""
    base = redirects.select("src", "dst").localCheckpoint(eager=True)
    n = base.count()
    if n <= driver_max_edges:
        pdf = base.toPandas()
        src = pdf["src"].to_numpy(dtype=object)
        dst = pdf["dst"].to_numpy(dtype=object)
        cur = dst.copy()
        for _ in range(max_iterations):
            # the distributed loop squares the EVOLVING map (cur joined to
            # cur), not the original one-hop map — rebuild it each round so
            # 2-cycles reach the dst == src fixpoint instead of oscillating
            mapping = pd.Series(cur, index=src)
            mapping = mapping[~mapping.index.duplicated(keep="first")]
            hop = mapping.reindex(cur).to_numpy(dtype=object)
            # stop at cycle fixpoint (dst == src) or outside the domain
            nxt = np.where(pd.notna(hop) & (cur != src), hop, cur)
            if (nxt == cur).all():
                return redirects.sparkSession.createDataFrame(
                    pd.DataFrame({"src": src, "dst": nxt}),
                    schema="src string, dst string",
                )
            cur = nxt
        warnings.warn(
            f"resolve_redirects: not converged after {max_iterations} rounds "
            "(redirect cycle longer than 2; remaining rows keep their "
            "current hop)",
            RuntimeWarning,
            stacklevel=2,
        )
        return redirects.sparkSession.createDataFrame(
            pd.DataFrame({"src": src, "dst": cur}),
            schema="src string, dst string",
        )
    cur = base
    for _ in range(max_iterations):
        nxt = (
            cur.alias("a")
            .join(
                cur.select(
                    F.col("src").alias("_m_src"), F.col("dst").alias("_m_dst")
                ),
                (F.col("a.dst") == F.col("_m_src")) & (F.col("a.dst") != F.col("a.src")),
                "left",
            )
            .select(
                F.col("a.src").alias("src"),
                F.coalesce("_m_dst", "a.dst").alias("dst"),
                (F.coalesce("_m_dst", "a.dst") != F.col("a.dst")).alias("_chg"),
            )
        )
        nxt = nxt.localCheckpoint(eager=True)
        n_changed = nxt.filter("_chg").count()
        cur = nxt.drop("_chg")
        if n_changed == 0:
            return cur
    warnings.warn(
        f"resolve_redirects: not converged after {max_iterations} rounds "
        "(redirect cycle longer than 2; remaining rows keep their current "
        "hop)",
        RuntimeWarning,
        stacklevel=2,
    )
    return cur


def extract_anchors(pages: DataFrame, resolve: bool = True) -> DataFrame:
    """(target_title, anchor, src_title) for every [[..]] link in ns=0
    non-redirect pages, with the reference's filters (:150-182): anchor
    folded via normalize_full, <2 chars dropped, target double-unescaped +
    capitalized, anchors kept only for targets that EXIST as ns=0 titles,
    and (optionally) redirect targets resolved transitively so anchors
    accrue to the final entity — exactly the alias-dictionary input FEL
    builds its datapack from."""
    content = pages.filter(
        (F.col("ns") == 0)
        & F.col("redirect").isNull()
        & ~F.col("markup").rlike(_REDIRECT_RE)
    )
    links = F.expr(r"regexp_extract_all(markup, '\\[\\[([^\\[\\]]+)\\]\\]', 1)")
    ex = content.select(
        _capitalize_first(F.col("title")).alias("src_title"),
        F.explode(links).alias("_link"),
    )
    raw_target = F.trim(
        F.regexp_replace(F.split(F.col("_link"), r"\|").getItem(0), "#.*$", "")
    )
    target = _capitalize_first(
        F.trim(_unescape_html(_unescape_html(raw_target)))
    )
    raw_anchor = F.element_at(F.split(F.col("_link"), r"\|"), -1)
    anchor = normalize_full(_unescape_html(_unescape_html(raw_anchor)))
    anchors = (
        ex.select("src_title", target.alias("target_title"), anchor.alias("anchor"))
        .filter(F.length(F.trim("anchor")) >= 2)
        .filter(F.length("target_title") > 0)
    )
    if resolve:
        res = resolve_redirects(redirect_edges(pages)).select(
            F.col("src").alias("target_title"), F.col("dst").alias("_final")
        )
        anchors = anchors.join(res, "target_title", "left").select(
            F.coalesce("_final", "target_title").alias("target_title"),
            "anchor",
            "src_title",
        )
    titles = pages.filter((F.col("ns") == 0) & F.col("redirect").isNull()).select(
        _capitalize_first(F.col("title")).alias("target_title")
    ).distinct()
    return anchors.join(titles, "target_title")
