"""L7 vs L8: the two segmentation policies diverge exactly as specified.

Fixture: 4 tokens with candidate spans
  (1,2) "a b"  seg_score -1.0
  (2,2) "b c"  seg_score -0.5   <- single best span, overlaps both others
  (3,2) "c d"  seg_score -3.0
NIL = -5.

- sum policy (L7, getBestChunking): picks "a b"+"c d" (sum -4 beats
  "b c" + two NILs = -10.5)
- max-iterative policy (L8, getBestChunkingMaxIterativeV2): picks the
  segmentation whose MAX chunk score is highest -> "b c" alone.
"""

from __future__ import annotations

from fel_spark.operators import mentions as M


def _best_spans(spark):
    rows = [
        ("c1", 0, 4, "a b", 1, 2, -1.0),
        ("c1", 0, 4, "b c", 2, 2, -0.5),
        ("c1", 0, 4, "c d", 3, 2, -3.0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, n_tokens int, span string, "
        "start int, length int, seg_score double",
    )
    from pyspark.sql import functions as F

    return df.select(
        "*",
        F.lit(7).alias("entity_id"),
        F.lit("_wiki_X").alias("entity_key"),
        F.col("seg_score").alias("score"),
    )


def test_sum_policy_picks_cover(spark):
    out = M.segment_mentions(_best_spans(spark), nil_score=-5.0).collect()
    got = {(r["start"], r["length"], r["span"]) for r in out}
    assert got == {(1, 2, "a b"), (3, 2, "c d")}


def test_max_iterative_policy_picks_peak(spark):
    out = M.segment_mentions_max_iterative(
        _best_spans(spark), nil_score=-5.0
    ).collect()
    got = {(r["start"], r["length"], r["span"]) for r in out}
    assert got == {(2, 2, "b c")}


def test_segment_dp_carry_across_arrow_batches(spark):
    """The tensor DP holds back a batch-straddling turn and re-runs it with
    the next Arrow batch: force 3-row batches over many multi-span turns
    and require bit-identical output to the default batch size."""
    from pyspark.sql import functions as F

    rows = []
    for t in range(40):
        cid = f"c{t % 7}"
        rows += [
            (cid, t, 4, "a b", 1, 2, -1.0 - t * 0.01),
            (cid, t, 4, "b c", 2, 2, -0.5 - t * 0.01),
            (cid, t, 4, "c d", 3, 2, -3.0 + t * 0.01),
        ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, n_tokens int, span string, "
        "start int, length int, seg_score double",
    ).select(
        "*",
        F.lit(7).alias("entity_id"),
        F.lit("_wiki_X").alias("entity_key"),
        F.col("seg_score").alias("score"),
    )

    def run():
        return sorted(
            (r["conv_id"], r["turn_idx"], r["start"], r["length"], r["span"])
            for r in M.segment_mentions(df, nil_score=-5.0).collect()
        )

    base = run()
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        tiny = run()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert tiny == base
    assert len(base) == 80  # 2 chosen spans per turn


def test_segment_dp_ignores_out_of_range_spans(spark):
    """Spans longer than max_span or extending past n_tokens are ignored
    (the dict-based DP never consulted them), not a tensor index crash."""
    from pyspark.sql import functions as F

    rows = [
        ("c1", 0, 4, "a b", 1, 2, -1.0),
        ("c1", 0, 4, "a b c d e", 1, 5, -0.1),  # length > max_span(4)
        ("c1", 0, 4, "d e", 4, 2, -0.1),  # start+len-1 > n_tokens
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, n_tokens int, span string, "
        "start int, length int, seg_score double",
    ).select(
        "*",
        F.lit(7).alias("entity_id"),
        F.lit("_wiki_X").alias("entity_key"),
        F.col("seg_score").alias("score"),
    )
    got = {
        (r["start"], r["length"]) for r in M.segment_mentions(df, nil_score=-5.0).collect()
    }
    assert got == {(1, 2)}


def test_segment_dp_tensor_cap_chunks_long_turns(spark):
    """A block mixing one long turn with many short ones is DP'd in
    whole-turn chunks when the dense tensor would exceed the cap —
    bit-identical output to the uncapped path."""
    from pyspark.sql import functions as F

    rows = []
    # one long turn: 64 tokens, candidates at every even position
    for s in range(1, 64, 2):
        rows.append(("long", 0, 64, f"sp{s}", s, 2, -0.4 - s * 0.01))
    # many short turns
    for t in range(30):
        cid = f"s{t % 5}"
        rows += [
            (cid, t + 1, 4, "a b", 1, 2, -1.0 - t * 0.01),
            (cid, t + 1, 4, "b c", 2, 2, -0.5 - t * 0.01),
        ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, n_tokens int, span string, "
        "start int, length int, seg_score double",
    ).select(
        "*",
        F.lit(7).alias("entity_id"),
        F.lit("_wiki_X").alias("entity_key"),
        F.col("seg_score").alias("score"),
    )

    def run(cap):
        return sorted(
            (r["conv_id"], r["turn_idx"], r["start"], r["length"], r["span"])
            for r in M.segment_mentions(
                df, nil_score=-5.0, dp_tensor_cap=cap
            ).collect()
        )

    base = run(M.DP_TENSOR_CAP)
    # cap chosen so the long turn forces its own chunk and the short turns
    # split across several more (64 tokens * 4 max_span = 256 > 260/2)
    assert run(260) == base
    assert run(1) == base  # degenerate: every turn its own chunk
    # long turn: 32 non-overlapping spans all win; short turns: "a b" and
    # "b c" overlap, the higher-scoring "b c" wins alone -> 30
    assert len(base) == 32 + 30


def test_segment_dp_fuzz_vs_scalar_reference(spark):
    """Randomized equivalence: the batched tensor DP vs a plain-Python
    transliteration of the original per-turn dict DP (strict-improvement
    scan over ascending lengths, NIL fallback only at length 1, candidate
    score used at length 1 even when below nil_score, emit only chosen
    spans with seg_score > nil_score). Fixed seed, ~60 random turns with
    duplicate keys, gaps, and score ties."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(20260818)
    NIL = -5.0
    MAXSPAN = M.MAX_SPAN_TOKENS
    rows = []
    turns = []
    for t in range(60):
        cid = f"c{t % 9}"
        n = rng.randint(1, 14)
        spans = []
        for _ in range(rng.randint(0, 10)):
            ln = rng.randint(1, min(MAXSPAN, n))
            st = rng.randint(1, n - ln + 1)
            # coarse grid -> frequent exact score ties
            sc = -round(rng.uniform(0.0, 8.0) * 4) / 4
            spans.append((st, ln, sc))
        turns.append((cid, t, n, spans))
        for st, ln, sc in spans:
            rows.append((cid, t, n, f"s{st}_{ln}", st, ln, sc))

    def scalar_ref():
        out = set()
        for cid, t, n, spans in turns:
            table = {}
            for st, ln, sc in spans:
                k = (st - 1, ln)
                if k not in table or sc > table[k]:
                    table[k] = sc
            NEG = float("-inf")
            m = [0.0] + [NEG] * n
            back = [None] * (n + 1)
            for j in range(1, n + 1):
                for ln in range(1, min(MAXSPAN, j) + 1):
                    i = j - ln
                    if m[i] == NEG:
                        continue
                    if (i, ln) in table:
                        s = table[(i, ln)]
                    elif ln == 1:
                        s = NIL
                    else:
                        continue
                    if m[i] + s > m[j]:
                        m[j] = m[i] + s
                        back[j] = (i, ln)
            j = n
            while j > 0 and back[j] is not None:
                i, ln = back[j]
                if (i, ln) in table and table[(i, ln)] > NIL:
                    out.add((cid, t, i + 1, ln))
                j = i
        return out

    if not rows:
        return
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, n_tokens int, span string, "
        "start int, length int, seg_score double",
    ).select(
        "*",
        F.lit(1).alias("entity_id"),
        F.lit("_wiki_X").alias("entity_key"),
        F.col("seg_score").alias("score"),
    )
    got = {
        (r["conv_id"], r["turn_idx"], r["start"], r["length"])
        for r in M.segment_mentions(df, nil_score=NIL).collect()
    }
    assert got == scalar_ref()
