"""Conversation-level integrity and shape statistics.

The first gate a transcript ingestion pipeline runs at 10^12-turn scale:
before any linking or dedup, verify per conversation that the turn index
is a clean sequence (no gaps, no duplicates), and profile the role/tool
mix. Bad conversations (truncated loads, double-writes, out-of-order
appends) are quarantined by id instead of silently corrupting every
downstream per-conversation operator (sessionization, coherence lattice,
segmentation DP — all assume contiguous turn order).

ONE shuffle (groupBy conv_id); all signals are plain aggregates, so the
map side combines and the reduce side is one row per conversation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def conversation_integrity(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    tool_col: str = "tool",
) -> DataFrame:
    """-> (conv_id, n_turns, n_distinct_idx, idx_min, idx_max, n_gaps,
    n_dup_idx, n_user, n_assistant, n_tool_calls, is_clean).

    ``n_gaps`` = missing indexes inside [idx_min, idx_max]; ``n_dup_idx`` =
    turns sharing an index. ``is_clean`` = dense 0-based index with no
    duplicates AND a non-null conversation id — a NULL id is itself load
    corruption, and equi-joins would silently drop those rows, so they must
    surface as dirty, never vanish. ``role_col`` / ``tool_col`` are
    profiled only if present in the schema (zeros otherwise), so the gate
    runs on minimal (conv, idx) tables too.
    """
    cols = set(transcripts.columns)
    role_aggs = (
        [
            F.sum(F.when(F.col(role_col) == "user", 1).otherwise(0)).alias("n_user"),
            F.sum(F.when(F.col(role_col) == "assistant", 1).otherwise(0)).alias(
                "n_assistant"
            ),
        ]
        if role_col in cols
        else [
            F.sum(F.lit(0)).cast("long").alias("n_user"),
            F.sum(F.lit(0)).cast("long").alias("n_assistant"),
        ]
    )
    tool_aggs = (
        [
            F.sum(
                F.when(F.col(tool_col).isNotNull() & (F.col(tool_col) != ""), 1)
                .otherwise(0)
            ).alias("n_tool_calls")
        ]
        if tool_col in cols
        else [F.sum(F.lit(0)).cast("long").alias("n_tool_calls")]
    )
    span = F.col("idx_max") - F.col("idx_min") + 1
    return (
        transcripts.groupBy(conv_col)
        .agg(
            F.count("*").alias("n_turns"),
            F.countDistinct(idx_col).alias("n_distinct_idx"),
            F.min(idx_col).alias("idx_min"),
            F.max(idx_col).alias("idx_max"),
            *role_aggs,
            *tool_aggs,
        )
        .withColumn("n_gaps", (span - F.col("n_distinct_idx")).cast("long"))
        .withColumn("n_dup_idx", (F.col("n_turns") - F.col("n_distinct_idx")).cast("long"))
        .withColumn(
            "is_clean",
            F.col(conv_col).isNotNull()
            & (F.col("n_gaps") == 0)
            & (F.col("n_dup_idx") == 0)
            & (F.col("idx_min") == 0),
        )
    )


def quarantine_conversations(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    tool_col: str = "tool",
) -> tuple[DataFrame, DataFrame]:
    """-> (clean_transcripts, dirty_conv_ids): split the corpus on the
    integrity check. The dirty side is ids-only (log it, reload those
    conversations) and includes a NULL row when null-id turns exist; the
    clean side is a left-semi join (NULL ids never match an equi-join, and
    is_clean already excludes them, so nothing vanishes silently)."""
    integ = conversation_integrity(
        transcripts,
        conv_col=conv_col,
        idx_col=idx_col,
        role_col=role_col,
        tool_col=tool_col,
    )
    dirty = integ.filter(~F.col("is_clean")).select(conv_col)
    clean = transcripts.join(
        integ.filter(F.col("is_clean")).select(conv_col), conv_col, "left_semi"
    )
    return clean, dirty


def tool_transitions(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """First-order tool-transition statistics over agent transcripts:
    which tool follows which. For each conversation ordered by turn
    index, adjacent tool-bearing turns form a (tool, next_tool)
    transition; the output is the transition matrix with conditional
    probabilities — the Markov summary an agent-behavior audit or a
    routing prior starts from (the reference's datapack mines the
    analogous alias->entity conditionals, `mine-datapack.sh`).

    Turns with a NULL/empty tool are skipped, not barriers: the
    transition is between CONSECUTIVE TOOL CALLS within a conversation
    (lead over the tool-bearing subsequence), matching how a tool-use
    trace reads. Output: (tool, next_tool, n, p_6dp, rank) where p_6dp
    = round(1e6 * n / n_from) and rank orders next_tool per tool by the
    engine-neutral key (n DESC, next_tool ASC).

    Scale: one conversation-keyed window + one dictionary-scale
    aggregate (distinct tool pairs); nothing corpus-wide shuffles twice.
    """
    from pyspark.sql import Window

    calls = transcripts.filter(
        F.col(tool_col).isNotNull() & (F.col(tool_col) != "")
    )
    w = Window.partitionBy(conv_col).orderBy(F.col(idx_col).asc())
    pairs = (
        calls.select(
            F.col(tool_col).alias("tool"),
            F.lead(tool_col).over(w).alias("next_tool"),
        )
        .filter(F.col("next_tool").isNotNull())
        .groupBy("tool", "next_tool")
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("tool")
    wr = Window.partitionBy("tool").orderBy(
        F.col("n").desc(), F.col("next_tool").asc()
    )
    return pairs.select(
        "tool",
        "next_tool",
        "n",
        F.round(F.col("n") * 1000000.0 / F.sum("n").over(wt))
        .cast("long")
        .alias("p_6dp"),
    ).withColumn("rank", F.row_number().over(wr).cast("int"))


def conversation_dedup(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Exact conversation-level dedup: two conversations are duplicates
    iff their turn texts agree in turn order. The fingerprint is md5
    over the joined PER-TURN md5s sorted by turn index — fixed-width
    tokens, so a text containing the separator can never alias a
    different turn split (document-level exact dedup —
    `dedup.exact_dedup` — misses these: each turn row is unique, the
    CONVERSATION is the repeated unit, e.g. re-ingested or replayed
    sessions in a transcript corpus).

    Returns one row per conversation: (conv_id, conv_fp, n_turns,
    dup_group_size, is_canonical) with the canonical = min conv_id per
    fingerprint group (the same keep-first convention as exact_dedup).

    Scale: one conversation-keyed aggregate (collect_list is bounded by
    turns-per-conversation, not corpus size) and one fingerprint-keyed
    window — both shuffles are key-local; no pair materialization.
    """
    from pyspark.sql import Window

    per = transcripts.groupBy(conv_col).agg(
        F.md5(
            F.concat_ws(
                "\x1f",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(idx_col, text_col))
                    ),
                    lambda s: F.md5(s[text_col]),
                ),
            )
        ).alias("conv_fp"),
        F.count("*").alias("n_turns"),
    )
    w = Window.partitionBy("conv_fp")
    return per.select(
        conv_col,
        "conv_fp",
        "n_turns",
        F.count("*").over(w).alias("dup_group_size"),
        (F.col(conv_col) == F.min(conv_col).over(w)).alias("is_canonical"),
    )


def conversation_near_dup(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    min_jaccard_4dp: int = 5_000,
    max_block: int = 200,
    hash_fn=None,
) -> DataFrame:
    """NEAR-duplicate conversation detection: re-ingested or replayed
    sessions that drop/gain a few turns escape
    :func:`conversation_dedup`'s exact fingerprint — here each
    conversation becomes the SET of its distinct turn fingerprints
    (md5 of turn text; order-free on purpose — a replay that reorders
    identical turns is still the same session), MinHash-LSH proposes
    candidate conversation pairs (`functions/hashing.py` explode +
    min-aggregate signatures, banded keys, salt-capped bucket join —
    the `dedup.py` discipline at conversation granularity), and exact
    turn-set Jaccard verifies. Output: (``id_a``, ``id_b``,
    ``jaccard_4dp``) pairs at or above ``min_jaccard_4dp``.

    ``hash_fn``: signature hash — default xxhash64 (codegen scale
    path); pass `hashing.md5_hash60` for the ANSI-replayable parity
    variant the driver oracle value-checks.

    Scale: the corpus-sized work is one distinct + one explode/min-agg
    (map-side combined to ``num_hashes`` longs per conversation); the
    bucket self-join is salt-capped; the verify join carries only the
    candidate pairs. Nothing pair-scale before LSH."""
    from fel_spark.functions.hashing import lsh_band_keys, minhash_signatures_df
    from fel_spark.operators.blocking import cap_blocks

    rows_per_band = num_hashes // bands
    tf = transcripts.select(
        F.col(conv_col).alias("cid"),
        F.md5(F.coalesce(F.col(text_col), F.lit("")).cast("string")).alias(
            "th"
        ),
    ).distinct()
    sets = tf.groupBy("cid").agg(
        F.array_sort(F.collect_set("th")).alias("ths")
    )
    with_sig = minhash_signatures_df(
        sets, F.col("ths"), ["cid"], num_hashes, hash_fn=hash_fn
    )
    banded = with_sig.withColumn(
        "block_key",
        F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band)),
    ).select("cid", "block_key")
    blocked = cap_blocks(banded, max_block=max_block, salt_col="cid")
    a = blocked.select(F.col("cid").alias("id_a"), "block_key")
    b = blocked.select(F.col("cid").alias("id_b"), "block_key")
    cand = (
        a.join(b, "block_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets.select(F.col("cid").alias("id_a"), F.col("ths").alias("ths_a"))
    sb = sets.select(F.col("cid").alias("id_b"), F.col("ths").alias("ths_b"))
    inter = F.size(F.array_intersect(F.col("ths_a"), F.col("ths_b")))
    union = F.size(F.col("ths_a")) + F.size(F.col("ths_b")) - inter
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.floor(inter * 10_000.0 / union).cast("long").alias(
                "jaccard_4dp"
            ),
        )
        .filter(F.col("jaccard_4dp") >= min_jaccard_4dp)
    )


def tool_loops(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    tool_col: str = "tool",
    max_period: int = 4,
    min_reps: int = 3,
) -> DataFrame:
    """Agent-LOOP detection: an agent stuck retrying cycles the same
    tool sequence (`act -> observe -> act ...`) — the conversation-level
    analogue of `textstats.repetition_signals`, and a standard hygiene
    gate before transcripts become training data (loops teach the
    model to loop). A loop of period ``p`` shows up as a run of
    consecutive tool-call positions where ``tool[i] == tool[i-p]``:
    for each period 1..``max_period`` the lag comparison is ONE
    co-partitioned self-join on (conversation, position - p), runs of
    matches are grouped with the gaps-and-islands key
    (pos - row_number over matches), and a run of length L at period p
    means the cycle played ``L div p + 1`` times.

    Output: one row per conversation that has >= 2 tool calls —
    (``conv_id``, ``period``, ``longest_run``, ``reps``,
    ``is_loop``) for the conversation's BEST period under
    (reps DESC, period ASC); ``is_loop`` = 1 when reps >= ``min_reps``.
    Conversations whose best lag never matches report period 0.

    Scale: positions are per-conversation windows (conversation-keyed,
    never global); each period adds one narrow self-join on the same
    partitioning; the island aggregation is keyed by (conv, period,
    island). Nothing pair-scale across conversations.
    """
    from pyspark.sql import Window as W

    calls = transcripts.filter(
        F.coalesce(F.col(tool_col), F.lit("")) != ""
    ).select(
        F.col(conv_col).alias("cid"),
        F.col(turn_col).alias("ti"),
        F.col(tool_col).alias("tool"),
    )
    wp = W.partitionBy("cid").orderBy("ti")
    pos = calls.withColumn("pos", F.row_number().over(wp))
    convs = pos.groupBy("cid").agg(F.count("*").alias("n_calls")).filter(
        F.col("n_calls") >= 2
    )
    best: DataFrame | None = None
    for p in range(1, max_period + 1):
        lagged = pos.select(
            "cid", (F.col("pos") + p).alias("pos"), F.col("tool").alias("_prev")
        )
        eq = (
            pos.join(lagged, ["cid", "pos"])
            .filter(F.col("tool") == F.col("_prev"))
            .select("cid", "pos")
        )
        wi = W.partitionBy("cid").orderBy("pos")
        runs = (
            eq.withColumn("_isl", F.col("pos") - F.row_number().over(wi))
            .groupBy("cid", "_isl")
            .agg(F.count("*").alias("run"))
            .groupBy("cid")
            .agg(F.max("run").alias("longest_run"))
            .select(
                "cid",
                F.lit(p).alias("period"),
                "longest_run",
                (F.expr(f"longest_run div {p}") + 1).alias("reps"),
            )
        )
        best = runs if best is None else best.unionByName(runs)
    wb = W.partitionBy("cid").orderBy(
        F.col("reps").desc(), F.col("period").asc()
    )
    top = (
        best.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        convs.join(top, "cid", "left")
        .select(
            F.col("cid").alias(conv_col),
            F.coalesce("period", F.lit(0)).cast("int").alias("period"),
            F.coalesce("longest_run", F.lit(0)).cast("long").alias(
                "longest_run"
            ),
            F.coalesce("reps", F.lit(0)).cast("long").alias("reps"),
            F.when(F.coalesce("reps", F.lit(0)) >= min_reps, 1)
            .otherwise(0)
            .cast("int")
            .alias("is_loop"),
        )
    )
