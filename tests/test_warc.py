"""WARC reader + HTML text extraction (sources/warc.py)."""

from __future__ import annotations

import zlib

import pytest

from fel_spark.sources.warc import (
    html_to_text,
    parse_warc_records,
    read_warc,
    read_warc_bytes,
    synth_page_html,
    synth_warc,
    synth_warc_bytes,
    synth_warc_bytes_range,
    warc_documents,
)


def test_parse_plain_and_gzip_layouts_agree():
    plain = list(parse_warc_records(synth_warc_bytes(7, gzip_records=False)))
    gz = list(parse_warc_records(synth_warc_bytes(7, gzip_records=True)))
    assert len(plain) == len(gz) == 8  # warcinfo + 7 responses
    for a, b in zip(plain, gz):
        assert a == b


def test_parse_http_split_and_status():
    recs = list(parse_warc_records(synth_warc_bytes(3)))
    assert recs[0]["warc_type"] == "warcinfo"
    for i, r in enumerate(recs[1:]):
        assert r["http_status"] == 200
        assert r["http_content_type"].startswith("text/html")
        assert r["url"].endswith(f"/p/{i}")
        assert r["payload"].startswith(b"<html>")  # HTTP headers stripped


def test_parse_corruption_gates():
    good = synth_warc_bytes(2, gzip_records=False)
    with pytest.raises(ValueError):
        list(parse_warc_records(good[: len(good) // 2]))  # truncated body
    with pytest.raises(ValueError):
        list(parse_warc_records(b"NOTWARC/1.0\r\n\r\n"))
    gz = synth_warc_bytes(2, gzip_records=True)
    with pytest.raises(ValueError):
        list(parse_warc_records(gz[:-10]))  # truncated gzip member


def test_html_to_text_rules():
    assert html_to_text(
        "<html><head><title>t</title><style>p{}</style></head>"
        "<body><p>a  b</p><script>x&amp;y</script><p>c &amp; d</p></body>"
    ) == "a b\nc & d"
    # nested drops + blocks inside drops stay dropped
    assert html_to_text("<script><p>no</p></script>yes") == "yes"
    # pathological input returns something (never raises)
    assert isinstance(html_to_text("<<<>>&#x;<p"), str)


def test_synth_closed_form():
    from fel_spark.sources.warc import html_main_content

    for i in (0, 3, 6, 11):
        nw = 5 + (i % 7)
        body = " ".join(f"w{i}_{j}" for j in range(nw)) + " & tail"
        exp_full = f"home about\nheading {i}\n{body}\nfooter {i}"
        assert html_to_text(synth_page_html(i)) == exp_full
        # boilerplate scorer keeps exactly the main paragraph
        assert html_main_content(synth_page_html(i)) == body


def test_html_main_content_rules():
    from fel_spark.sources.warc import html_main_content

    page = (
        "<body>"
        '<div><a href="/">Home</a> | <a href="/b">About this site</a></div>'
        "<p>This paragraph is long enough to keep and contains no anchors.</p>"
        '<p>Mostly <a href="/x">a very long anchor text that dominates</a> y.</p>'
        "<p>tiny</p>"
        "</body>"
    )
    out = html_main_content(page)
    assert out == "This paragraph is long enough to keep and contains no anchors."
    # threshold knobs work
    assert "tiny" in html_main_content(page, min_len=1, max_link_density=1.0)


def test_read_warc_files_and_documents(spark, tmp_path):
    path = synth_warc(spark, str(tmp_path / "warc"), n=5, files=3)
    recs = read_warc(spark, path + "/*.warc.gz")
    assert recs.count() == 3 * 6  # warcinfo + 5 responses per file
    docs = warc_documents(recs)
    rows = {r.doc_id: r for r in docs.collect()}
    assert len(rows) == 15
    r7 = rows["https://site3.example/p/7"]
    assert r7.source == "site3.example"
    assert r7.text.startswith("home about\nheading 7\nw7_0 ")
    assert r7.text.endswith("footer 7")
    main = {
        r.doc_id: r
        for r in warc_documents(recs, main_content=True).collect()
    }
    assert main["https://site3.example/p/7"].text.startswith("w7_0 ")
    assert main["https://site3.example/p/7"].text.endswith("& tail")


def test_read_warc_bytes_matches_file_path(spark, tmp_path):
    # the in-memory parse path (used by the driver oracle query) must
    # agree with the binaryFile path record-for-record
    path = synth_warc(spark, str(tmp_path / "warc2"), n=4, files=2)
    via_files = {
        (r.url, bytes(r.payload))
        for r in read_warc(spark, path + "/*.warc.gz").collect()
    }
    mem = spark.createDataFrame(
        [(bytearray(synth_warc_bytes_range(f * 4, 4)),) for f in range(2)],
        "content binary",
    )
    via_bytes = {
        (r.url, bytes(r.payload)) for r in read_warc_bytes(mem).collect()
    }
    assert via_files == via_bytes


def test_warc_documents_feed_corpus_operators(spark):
    # the extracted documents flow straight into the existing text stack
    from fel_spark.operators.dedup import exact_dedup

    mem = spark.createDataFrame(
        [(bytearray(synth_warc_bytes_range(0, 6)),),
         (bytearray(synth_warc_bytes_range(0, 6)),)],  # duplicate segment
        "content binary",
    )
    docs = warc_documents(read_warc_bytes(mem))
    assert docs.count() == 12
    mapping = exact_dedup(docs, text_col="text", id_col="doc_id")
    # byte-identical page bodies collapse to 6 canonical docs
    assert mapping.select("canonical_id").distinct().count() == 6
    assert mapping.filter("dup_count = 2").count() == 12


def test_canonicalize_url_rules(spark):
    from fel_spark.functions.text import canonicalize_url

    cases = [
        ("HTTP://Example.COM:80/a?utm_source=x&z=1&a=2#f", "http://example.com/a?a=2&z=1"),
        ("https://Site.io:443/", "https://site.io/"),
        ("https://site.io:8443/p?b=2&fbclid=abc&a=1", "https://site.io:8443/p?a=1&b=2"),
        ("https://site.io", "https://site.io/"),
        ("not a url", "not a url"),
    ]
    df = spark.createDataFrame(cases, "u string, exp string")
    rows = df.select("exp", canonicalize_url("u").alias("got")).collect()
    for r in rows:
        assert r.got == r.exp
    # duplicate-link collapse: the dedup-key property
    dups = spark.createDataFrame(
        [("https://dup.example/page?utm_source=a",),
         ("https://DUP.example:443/page#top",),
         ("https://dup.example/page",)],
        "u string",
    )
    keys = dups.select(canonicalize_url("u").alias("k")).distinct().count()
    assert keys == 1


def test_canonicalize_url_plan_is_udf_free(spark):
    from fel_spark.functions.text import canonicalize_url

    df = spark.createDataFrame([("https://x.io/a?b=1",)], "u string")
    plan = df.select(canonicalize_url("u"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_warc_to_corpus_prep_end_to_end(spark, tmp_path):
    """The full crawl front-end composed with the existing corpus plan:
    WARC segments -> records -> canonical-URL dedup -> main-content
    extraction -> run_corpus_prep (filter/dedup/split/pack)."""
    import pyspark.sql.functions as F

    from fel_spark.functions.text import canonicalize_url
    from fel_spark.plans.corpus import run_corpus_prep

    path = synth_warc(spark, str(tmp_path / "warc3"), n=8, files=2)
    recs = read_warc(spark, path + "/*.warc.gz")
    docs = warc_documents(recs, main_content=True)
    # canonical-URL dedup BEFORE text dedup: tracking-link twins collapse
    docs = (
        docs.withColumn("canon", canonicalize_url("doc_id"))
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("canon")
                .orderBy("doc_id")
            ),
        )
        .filter("rn = 1")
        .select(F.col("canon").alias("doc_id"), "source", "text")
    )
    assert docs.count() == 16
    run_dir = str(tmp_path / "run_warc")
    # synthetic pages are token soup, so relax the English/stopword gates
    # (the composition under test is ingest -> dedupe -> plan, not the
    # filter thresholds, which have their own oracled query)
    manifest = run_corpus_prep(
        spark, run_dir, docs, pack_budget=64, pack_shards=2,
        filter_kwargs={"min_words": 3, "max_words": 10_000,
                       "min_stopword_4dp": 0, "langs": ("en", "other"),
                       "max_top_word_4dp": 10_000},
    )
    rows = manifest.collect()
    assert len(rows) > 0
    kept = spark.read.parquet(f"{run_dir}/near_deduped")
    assert 0 < kept.count() <= 16
