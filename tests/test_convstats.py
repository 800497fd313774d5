"""Conversation-integrity gate: gaps, duplicate indexes, role/tool mix."""

from __future__ import annotations

from datetime import datetime

from fel_spark.operators.convstats import (
    conversation_integrity,
    quarantine_conversations,
)


def _transcripts(spark):
    ts = datetime(2024, 1, 1)
    rows = [
        # clean conversation: dense 0-based, alternating, one tool call
        ("c1", 0, "user", "hi", None, ts),
        ("c1", 1, "assistant", "hello", "search", ts),
        ("c1", 2, "user", "thanks", None, ts),
        # gap: missing turn 1
        ("c2", 0, "user", "a", None, ts),
        ("c2", 2, "assistant", "b", None, ts),
        # duplicate index
        ("c3", 0, "user", "x", None, ts),
        ("c3", 0, "user", "x again", None, ts),
        ("c3", 1, "assistant", "y", None, ts),
        # 1-based (not 0-based) index
        ("c4", 1, "user", "late start", None, ts),
    ]
    return spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def test_conversation_integrity_signals(spark):
    integ = {
        r["conv_id"]: r for r in conversation_integrity(_transcripts(spark)).collect()
    }
    c1 = integ["c1"]
    assert c1["is_clean"] and c1["n_gaps"] == 0 and c1["n_dup_idx"] == 0
    assert (c1["n_user"], c1["n_assistant"], c1["n_tool_calls"]) == (2, 1, 1)
    assert integ["c2"]["n_gaps"] == 1 and not integ["c2"]["is_clean"]
    assert integ["c3"]["n_dup_idx"] == 1 and not integ["c3"]["is_clean"]
    assert not integ["c4"]["is_clean"]  # 1-based


def test_quarantine_split(spark):
    clean, dirty = quarantine_conversations(_transcripts(spark))
    assert {r["conv_id"] for r in clean.select("conv_id").distinct().collect()} == {"c1"}
    assert {r["conv_id"] for r in dirty.collect()} == {"c2", "c3", "c4"}
    # clean side keeps the original schema untouched
    assert clean.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_synth_corpus_is_clean(spark, dict_pack):
    """The deterministic synthetic corpus must pass its own ingestion gate."""
    from fel_spark.sources.synth import synth_transcripts_df, transcripts

    t = transcripts(synth_transcripts_df(spark, dict_pack, n_conv=30, turns_per_conv=4))
    integ = conversation_integrity(t)
    assert integ.filter(~integ.is_clean).count() == 0


def test_null_conv_id_is_quarantined_not_dropped(spark):
    """NULL conversation ids are load corruption; they must surface on the
    dirty side, never vanish through the equi-join."""
    ts = datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "user", "ok", None, ts),
        ("c1", 1, "assistant", "ok", None, ts),
        (None, 0, "user", "orphan", None, ts),
        (None, 1, "assistant", "orphan", None, ts),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    clean, dirty = quarantine_conversations(t)
    assert clean.count() == 2  # only c1's turns
    dirty_ids = [r["conv_id"] for r in dirty.collect()]
    assert dirty_ids == [None]  # the null group is visibly dirty


def test_integrity_on_minimal_schema(spark):
    """The gate runs on bare (conv, idx) tables: role/tool profiling is
    optional and zero-filled when the columns are absent."""
    t = spark.createDataFrame([("c1", 0), ("c1", 1)], ["conv_id", "turn_idx"])
    integ = conversation_integrity(t).collect()[0]
    assert integ["is_clean"] and integ["n_user"] == 0 and integ["n_tool_calls"] == 0
    clean, dirty = quarantine_conversations(t)
    assert clean.count() == 2 and dirty.count() == 0


def test_conv_integrity_oracle_with_null_ts_and_ties(spark, tmp_path):
    """Regression for the driver's r3 hash mismatch: the conv_integrity
    derivation must agree with its DuckDB oracle even when the events
    table contains NULL ts (Spark windows default NULLS FIRST, DuckDB
    NULLS LAST), exact (ts, event_id) ties, fully duplicated rows, and
    NULL event_id/event_type — the rank key coalesces every component, so
    the planted corruption lands identically in both engines."""
    import duckdb
    from datetime import datetime

    import __spark_entry__ as E
    from scripts.check_oracle import table_hash

    t0 = datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    # users 11 and 22 hit the %11 gap branch; 13 and 26 the %13 dup branch
    for uid in (1, 2, 11, 13, 22, 26, 143):  # 143 hits BOTH branches
        rows += [
            (uid * 10 + 0, t0, uid, "view", 1.0, "p"),
            (uid * 10 + 1, t0, uid, "click", 1.0, "p"),  # tie on ts
            (uid * 10 + 1, t0, uid, "click", 1.0, "p"),  # full duplicate row
            (None, t0, uid, "view", 1.0, "p"),  # NULL event_id
            (uid * 10 + 3, None, uid, None, 1.0, "p"),  # NULL ts + event_type
            (uid * 10 + 4, datetime(2024, 3, 2), uid, "buy", 1.0, "p"),
        ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(path)

    res = E.queries()["conv_integrity"](spark, str(tmp_path))
    cols, srows = res.columns, [tuple(r) for r in res.collect()]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{path}/*.parquet'")
    rel = con.sql(E.oracle_sql()["conv_integrity"])
    ocols, orows = list(rel.columns), rel.fetchall()
    assert sorted(cols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert table_hash(cols, srows) == table_hash(ocols, orows)
    # the hostile rows actually exercised the signals
    by_id = {r[0]: r for r in srows}
    assert any(r["n_dup_idx"] > 0 for r in res.collect())
    assert by_id[11] != by_id[1]  # corruption branch fired


def test_conversation_dedup_groups_and_canonical(spark):
    from fel_spark.operators.convstats import conversation_dedup

    # c1 and c3 are exact duplicates (same texts in turn order) even
    # though c3's rows arrive permuted; c2 differs in one turn; c4 is a
    # PREFIX of c1 (must NOT collapse — different n_turns, different fp)
    rows = [
        ("c1", 1, "hi"), ("c1", 2, "how do I reset?"), ("c1", 3, "thanks"),
        ("c2", 1, "hi"), ("c2", 2, "how do I reset?"), ("c2", 3, "bye"),
        ("c3", 3, "thanks"), ("c3", 1, "hi"), ("c3", 2, "how do I reset?"),
        ("c4", 1, "hi"), ("c4", 2, "how do I reset?"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {r["conv_id"]: r for r in conversation_dedup(df).collect()}
    assert len(out) == 4
    assert out["c1"]["conv_fp"] == out["c3"]["conv_fp"]
    assert out["c1"]["conv_fp"] != out["c2"]["conv_fp"]
    assert out["c1"]["conv_fp"] != out["c4"]["conv_fp"]
    assert out["c1"]["dup_group_size"] == 2
    assert out["c1"]["is_canonical"] and not out["c3"]["is_canonical"]
    assert out["c2"]["is_canonical"] and out["c4"]["is_canonical"]
    assert out["c4"]["n_turns"] == 2


def test_conversation_dedup_separator_injection(spark):
    from fel_spark.operators.convstats import conversation_dedup

    # a text containing the \x1f separator must not alias a two-turn
    # conversation onto a one-turn one: per-turn md5s are fixed-width,
    # so the joined fingerprint cannot be forged by embedded separators
    rows = [("a", 1, "x\x1fy"), ("b", 1, "x"), ("b", 2, "y")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {r["conv_id"]: r for r in conversation_dedup(df).collect()}
    assert out["a"]["conv_fp"] != out["b"]["conv_fp"]
    assert out["a"]["dup_group_size"] == 1 and out["b"]["dup_group_size"] == 1


def test_conversation_near_dup_planted(spark):
    from fel_spark.operators.convstats import conversation_near_dup

    # conv 1 (10 turns) and conv 2 (9 shared + 2 extra = 11 turns):
    # J = 9/12 = 0.75; conv 3 unrelated. Exact dedup misses 1~2 entirely.
    rows = []
    for t in range(10):
        rows.append((1, f"turn-{t}"))
    for t in range(1, 10):
        rows.append((2, f"turn-{t}"))
    rows += [(2, "extra-a"), (2, "extra-b")]
    rows += [(3, f"other-{t}") for t in range(10)]
    df = spark.createDataFrame(rows, "conv_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_4dp"]
        for r in conversation_near_dup(df, min_jaccard_4dp=5000).collect()
    }
    assert got == {(1, 2): 9 * 10_000 // 12}


def test_conversation_near_dup_order_free(spark):
    from fel_spark.operators.convstats import conversation_near_dup

    # same turn SET in different order/multiplicity is jaccard 1.0
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "c"), (2, "b"), (2, "a"), (2, "a")]
    df = spark.createDataFrame(rows, "conv_id long, text string")
    got = conversation_near_dup(df, min_jaccard_4dp=9000).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard_4dp"]) for r in got] == [
        (1, 2, 10_000)
    ]


def test_tool_loops_planted_cycle(spark):
    from fel_spark.operators.convstats import tool_loops

    # conv 1: a period-2 cycle (search, fetch) x 4 -> lag-2 run of 6,
    # reps 4. conv 2: all-distinct tools, no lag ever matches. conv 3:
    # same tool 5x = period-1 loop.
    rows = []
    for i, tool in enumerate(["search", "fetch"] * 4):
        rows.append((1, i, tool))
    for i, tool in enumerate(["a", "b", "c", "d"]):
        rows.append((2, i, tool))
    for i in range(5):
        rows.append((3, i, "retry"))
    df = spark.createDataFrame(rows, "conv_id long, turn_idx long, tool string")
    got = {
        r["conv_id"]: (r["period"], r["longest_run"], r["reps"], r["is_loop"])
        for r in tool_loops(df).collect()
    }
    assert got[1] == (2, 6, 4, 1)
    assert got[2] == (0, 0, 0, 0)
    assert got[3] == (1, 4, 5, 1)


def test_tool_loops_replay_fuzz(spark):
    import random

    from fel_spark.operators.convstats import tool_loops

    def py_loops(seqs, max_period, min_reps):
        out = {}
        for cid, tools in seqs.items():
            if len(tools) < 2:
                continue
            best = None
            for p in range(1, max_period + 1):
                run = longest = 0
                for i in range(len(tools)):
                    if i >= p and tools[i] == tools[i - p]:
                        run += 1
                        longest = max(longest, run)
                    else:
                        run = 0
                if longest > 0:
                    reps = longest // p + 1
                    cand = (reps, -p, p, longest)
                    if best is None or cand > best:
                        best = cand
            if best is None:
                out[cid] = (0, 0, 0, 0)
            else:
                reps, _, p, longest = best
                out[cid] = (p, longest, reps, 1 if reps >= min_reps else 0)
        return out

    rng = random.Random(149)
    seqs = {
        c: [rng.choice("xyz") for _ in range(rng.randint(2, 20))]
        for c in range(8)
    }
    rows = [
        (c, i, t) for c, tools in seqs.items() for i, t in enumerate(tools)
    ]
    df = spark.createDataFrame(rows, "conv_id long, turn_idx long, tool string")
    got = {
        r["conv_id"]: (r["period"], r["longest_run"], r["reps"], r["is_loop"])
        for r in tool_loops(df, max_period=3, min_reps=3).collect()
    }
    assert got == py_loops(seqs, 3, 3)
