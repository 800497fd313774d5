"""S8: evaluation-XML reader (`io/WebscopeXmlReader.java:28-45`).

The reference parses the Webscope ``ydata-search-query-log-to-entities``
XML (sessions -> queries -> annotations) into Query/Session objects with a
DOM parser on one JVM. Spark-first restatement: files load distributed via
the binaryFile source (one row per file — eval sets are many small files at
scale) and each file is parsed inside ``mapInPandas`` with the stdlib
ElementTree, exploding to one row per query with a typed annotations array.
No spark-xml package needed; parallelism = number of files.

Semantics preserved from the reference:
- boolean judgment flags default false, set by attribute value "true"
  (`WebscopeXmlReader.java:115-129`);
- ``assessor`` / ``starttime`` carried through;
- duplicate annotation targets within one query are dropped, as are empty
  targets (`WebscopeXmlReader.java:170` — the "quick and dirty fix");
- query ids are sequential per FILE (the reference's single-file global
  counter, applied per input split for determinism under parallelism).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

EVAL_SCHEMA = (
    "session_id string, query_id string, text string, assessor string, "
    "starttime string, adult boolean, ambiguous boolean, "
    "cannot_judge boolean, navigational boolean, no_wp boolean, "
    "non_english boolean, quote_question boolean, "
    "annotations array<struct<span:string, target:string, main:boolean>>"
)

_FLAGS = {
    "adult": "adult",
    "ambiguous": "ambiguous",
    "cannot-judge": "cannot_judge",
    "navigational": "navigational",
    "no-wp": "no_wp",
    "non-english": "non_english",
    "quote-question": "quote_question",
}


def _parse_file(content: bytes, fname: str) -> list[dict]:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(content)
    rows: list[dict] = []
    qid = 0
    for session in root:
        sid = session.attrib.get("id")
        for query in session:
            qid += 1
            row: dict = {
                "session_id": sid,
                "query_id": f"{fname}#{qid}",
                "text": None,
                "assessor": query.attrib.get("assessor"),
                "starttime": query.attrib.get("starttime"),
            }
            for attr, col in _FLAGS.items():
                row[col] = query.attrib.get(attr) == "true"
            annos, done = [], set()
            for child in query:
                if child.tag == "text":
                    row["text"] = child.text
                elif child.tag == "annotation":
                    main = child.attrib.get("main") == "true"
                    span = target = ""
                    for t in child:
                        if t.tag == "target":
                            target = t.text or ""
                        elif t.tag == "span":
                            span = t.text or ""
                    if target.strip() and target not in done:
                        done.add(target)
                        annos.append(
                            {"span": span, "target": target, "main": main}
                        )
            row["annotations"] = annos
            rows.append(row)
    return rows


def read_eval_xml(spark: SparkSession, path: str) -> DataFrame:
    """-> one row per judged query (EVAL_SCHEMA), parsed distributed."""
    files = spark.read.format("binaryFile").load(path)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split(" ")[0] for f in EVAL_SCHEMA.split(", ")]
        for pdf in batches:
            rows: list[dict] = []
            for content, fpath in zip(pdf["content"], pdf["path"]):
                fname = fpath.rsplit("/", 1)[-1]
                rows.extend(_parse_file(bytes(content), fname))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("content", "path").mapInPandas(gen, schema=EVAL_SCHEMA)


def eval_annotations(queries_df: DataFrame) -> DataFrame:
    """Explode to one row per (query, annotation) — the gold
    (mention_id, entity_id) shape `plans.pipeline.make_labeled_pairs`
    consumes (mention_id = query_id, entity = annotation target)."""
    return (
        queries_df.select(
            "session_id",
            "query_id",
            "text",
            F.explode("annotations").alias("a"),
        )
        .select(
            "session_id",
            F.col("query_id").alias("mention_id"),
            "text",
            F.col("a.span").alias("span"),
            F.col("a.target").alias("entity_id"),
            F.col("a.main").alias("main"),
        )
    )
