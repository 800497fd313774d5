"""Chat-export JSONL -> the engine's canonical transcripts shape.

Conversation datasets ship as JSONL where each line is one conversation
with a ``messages`` array (the OpenAI-chat-format family: role/content
per message, optional tool name). This source maps that onto the
pipeline's input contract ``(conv_id, turn_idx, role, text, tool, ts)``
— the exact table every ER/blocking/scoring operator consumes — with
PURE column expressions: ``from_json`` for the parse, ``posexplode``
for turn numbering, no Python in the path.

Malformed lines (non-JSON, missing fields) produce NULL structs from
``from_json`` and are routed to a quarantine count rather than crashing
the job — at 10^12 turns a single bad export line must not kill ingest.

- `chat_lines_to_transcripts(lines_df)` — (value: string) -> transcripts
- `read_chat_jsonl(spark, path)` — text-file wrapper (one task per
  split; JSONL is line-splittable so big exports parallelize naturally,
  unlike the WARC/tar sources whose grain is the file)
- `quarantine_counts(lines_df)` — (ok, bad) line counts for the audit
- `synth_chat_jsonl_lines(n)` — deterministic closed-form lines

Reference analogue: the engine's other ingest front-ends parse public
dump formats directly (`wikixml.py`, `warc.py`); chat JSONL is the
transcript-native one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CHAT_JSON_SCHEMA = (
    "struct<conv_id:string, ts:string, "
    "messages:array<struct<role:string, content:string, tool:string>>>"
)


def _parsed(lines: DataFrame) -> DataFrame:
    return lines.select(
        F.from_json(F.col("value"), CHAT_JSON_SCHEMA).alias("c")
    )


def chat_lines_to_transcripts(lines: DataFrame) -> DataFrame:
    """(value string) JSONL lines -> (conv_id, turn_idx, role, text,
    tool, ts). Lines whose parse fails or that lack conv_id/messages are
    dropped here (count them via `quarantine_counts` for the audit)."""
    ok = _parsed(lines).filter(
        F.col("c").isNotNull()
        & F.col("c.conv_id").isNotNull()
        & F.col("c.messages").isNotNull()
    )
    return ok.select(
        F.col("c.conv_id").alias("conv_id"),
        F.col("c.ts").cast("timestamp").alias("ts"),
        F.posexplode("c.messages").alias("turn_idx", "m"),
    ).select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        F.col("m.role").alias("role"),
        F.col("m.content").alias("text"),
        F.col("m.tool").alias("tool"),
        "ts",
    )


def quarantine_counts(lines: DataFrame) -> DataFrame:
    """One row: (ok_lines, bad_lines) — bad = unparseable or missing the
    required fields. The ingest audit the corpus metrics log."""
    p = _parsed(lines)
    good = (
        F.col("c").isNotNull()
        & F.col("c.conv_id").isNotNull()
        & F.col("c.messages").isNotNull()
    )
    return p.agg(
        F.sum(F.when(good, 1).otherwise(0)).cast("long").alias("ok_lines"),
        F.sum(F.when(good, 0).otherwise(1)).cast("long").alias("bad_lines"),
    )


def read_chat_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL file(s) -> transcripts. Line-splittable: Spark's text source
    splits big exports across tasks, so parallelism is row-range-grained
    (no one-file-per-task bottleneck)."""
    return chat_lines_to_transcripts(spark.read.text(path))


def synth_chat_jsonl_lines(n: int = 20) -> list[str]:
    """n closed-form conversation lines: conversation i has 2 + (i % 3)
    messages cycling roles user/assistant/tool; message j's content is
    'msg <i> <j>'; tool messages name tool 't<i%4>'; every 7th line is
    deliberately malformed (truncated JSON) to exercise quarantine."""
    lines = []
    for i in range(n):
        if i % 7 == 6:
            lines.append('{"conv_id": "c%04d", "messages": [broken' % i)
            continue
        nm = 2 + (i % 3)
        msgs = []
        for j in range(nm):
            role = ["user", "assistant", "tool"][j % 3]
            tool = f', "tool": "t{i % 4}"' if role == "tool" else ""
            msgs.append(
                f'{{"role": "{role}", "content": "msg {i} {j}"{tool}}}'
            )
        lines.append(
            f'{{"conv_id": "c{i:04d}", "ts": "2026-01-01 00:00:{i % 60:02d}", '
            f'"messages": [{", ".join(msgs)}]}}'
        )
    return lines
