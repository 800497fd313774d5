"""Training-example assembly (operators/examples.py)."""

from __future__ import annotations

import pytest

from fel_spark.operators.examples import context_windows, sliding_chunks


def test_sliding_chunks_coverage_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame([("d", text)], "doc_id string, text string")
    rows = sorted(
        sliding_chunks(docs, chunk_tokens=4, stride=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.start_tok for r in rows] == [0, 2, 4, 6, 8]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t2 t3 t4 t5"  # overlap of stride
    assert rows[-1].chunk_text == "t8 t9" and rows[-1].n_tokens == 2
    # every token appears in at least one chunk
    seen = set()
    for r in rows:
        seen.update(r.chunk_text.split(" "))
    assert seen == {f"t{i}" for i in range(10)}


def test_sliding_chunks_edges(spark):
    docs = spark.createDataFrame(
        [("short", "a b"), ("empty", "   "), ("one", "x")],
        "doc_id string, text string",
    )
    rows = {(r.doc_id, r.chunk_idx): r
            for r in sliding_chunks(docs, chunk_tokens=4, stride=2).collect()}
    assert rows[("short", 0)].chunk_text == "a b"
    assert ("one", 0) in rows and rows[("one", 0)].n_tokens == 1
    assert not any(k[0] == "empty" for k in rows)  # no tokens -> no chunks
    with pytest.raises(ValueError):
        sliding_chunks(docs, chunk_tokens=0)


def test_sliding_chunks_plan_is_map_only(spark):
    docs = spark.createDataFrame([("d", "a b c")], "doc_id string, text string")
    plan = (
        sliding_chunks(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_context_windows_semantics(spark):
    rows = [
        ("c", 0, "user", "hi"),
        ("c", 1, "assistant", "hello"),
        ("c", 2, "user", "query"),
        ("c", 3, "tool", "result"),
        ("c", 4, "assistant", "answer"),
        ("d", 0, "assistant", "opening"),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = {(r.conv_id, r.turn_idx): r for r in context_windows(t, k=2).collect()}
    assert set(out) == {("c", 1), ("c", 4), ("d", 0)}
    assert out[("c", 1)].context == "user: hi"
    assert out[("c", 1)].target == "hello"
    # only the previous k=2 turns, in turn order
    assert out[("c", 4)].context == "user: query\ntool: result"
    assert out[("d", 0)].context == ""  # first-turn target: empty context


def test_context_windows_shuffle_is_conversation_keyed(spark):
    t = spark.createDataFrame(
        [("c", 0, "assistant", "x")],
        "conv_id string, turn_idx int, role string, text string",
    )
    plan = context_windows(t)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the window's partitionBy only
    assert "hashpartitioning(conv_id" in plan
