"""Chat-export JSONL ingestion (sources/chatjsonl.py)."""

from __future__ import annotations

import pytest

from fel_spark.sources.chatjsonl import (
    chat_lines_to_transcripts,
    quarantine_counts,
    read_chat_jsonl,
    synth_chat_jsonl_lines,
)


def _lines_df(spark, n=15):
    return spark.createDataFrame(
        [(l,) for l in synth_chat_jsonl_lines(n)], "value string"
    )


def test_transcripts_contract_shape(spark):
    t = chat_lines_to_transcripts(_lines_df(spark))
    assert t.schema.simpleString() == (
        "struct<conv_id:string,turn_idx:int,role:string,text:string,"
        "tool:string,ts:timestamp>"
    )
    rows = {(r.conv_id, r.turn_idx): r for r in t.collect()}
    # conversation 1 has 3 turns: user/assistant/tool
    assert rows[("c0001", 0)].role == "user"
    assert rows[("c0001", 1)].role == "assistant"
    assert rows[("c0001", 2)].role == "tool"
    assert rows[("c0001", 2)].tool == "t1"
    assert rows[("c0001", 2)].text == "msg 1 2"
    assert rows[("c0001", 0)].tool is None
    assert rows[("c0001", 0)].ts.second == 1


def test_malformed_lines_quarantined_not_fatal(spark):
    lines = _lines_df(spark, 15)  # lines 6 and 13 are broken JSON
    t = chat_lines_to_transcripts(lines)
    convs = {r.conv_id for r in t.select("conv_id").distinct().collect()}
    assert "c0006" not in convs and "c0013" not in convs
    assert len(convs) == 13
    q = quarantine_counts(lines).collect()[0]
    assert (q.ok_lines, q.bad_lines) == (13, 2)


def test_missing_fields_also_quarantined(spark):
    lines = spark.createDataFrame(
        [('{"conv_id": "x"}',),           # no messages
         ('{"messages": []}',),           # no conv_id
         ('{"conv_id": "y", "messages": []}',),  # ok but empty
         ("plain text",)],
        "value string",
    )
    q = quarantine_counts(lines).collect()[0]
    assert (q.ok_lines, q.bad_lines) == (1, 3)
    assert chat_lines_to_transcripts(lines).count() == 0  # empty messages


def test_read_chat_jsonl_from_files(spark, tmp_path):
    p = tmp_path / "chats.jsonl"
    p.write_text("\n".join(synth_chat_jsonl_lines(8)) + "\n")
    t = read_chat_jsonl(spark, str(p))
    # 8 lines, line 6 broken; turns = sum over kept i of 2 + (i % 3)
    expected = sum(2 + (i % 3) for i in range(8) if i % 7 != 6)
    assert t.count() == expected


def test_chat_jsonl_plan_is_map_only(spark):
    plan = (
        chat_lines_to_transcripts(_lines_df(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chat_jsonl_feeds_transcript_consumers(spark):
    # the mapped transcripts drop into transcript consumers: normalize +
    # span enumeration (the ER front door) runs on the contract columns
    from fel_spark.functions.text import normalize_fast

    t = chat_lines_to_transcripts(_lines_df(spark, 10))
    n = t.select("conv_id", "turn_idx", normalize_fast("text").alias("norm"))
    rows = n.filter("conv_id = 'c0002' and turn_idx = 1").collect()
    assert rows[0].norm == "msg 2 1"
    agg = t.groupBy("conv_id").count().collect()
    assert all(r["count"] >= 2 for r in agg)
