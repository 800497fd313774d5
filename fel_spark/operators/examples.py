"""Training-example assembly: sliding-window chunking and conversation
context windows — the step between a clean corpus and a trainer's input.

Both operators are PURE column expressions (sequence/slice/window
functions inside codegen — no UDF, no shuffle beyond the one a window
spec needs), and both are exactly replayable in ANSI-ish SQL, so the
driver value-checks them like the relational core.

- `sliding_chunks(docs, chunk_tokens, stride)` — overlapping fixed-size
  token windows per document (RAG indexing / long-doc training prep).
  Complements `packing.pack_sequences`, which concatenates whole docs
  into budgeted streams; this SPLITS single docs into overlapping views.
- `context_windows(transcripts, k)` — for every assistant turn, the
  previous <= k turns as rendered context plus the turn's text as the
  target (SFT example extraction from conversation logs). One window
  spec partitioned by conversation: the shuffle is conversation-keyed,
  exactly the ER pipeline's partitioning, so at corpus scale this rides
  the same co-partitioning.

Reference analogue: the reference feeds its downstream consumers
flattened per-query training rows (`CountNGramsFromQueries.java`,
mine-datapack.sh postprocessing); these are the transcript-era versions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def sliding_chunks(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, chunk_idx, start_tok, n_tokens, chunk_text).

    Whitespace tokenization (split on runs of whitespace — the same
    definition the SQL oracle uses), chunk starts at 0, stride, 2*stride,
    ... while start < n_tokens (every token lands in >= 1 chunk; the last
    chunk may be short). ``stride < chunk_tokens`` gives overlap.
    Map-only: sequence + transform + explode, no shuffle.
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    d = docs.select(F.col(id_col), toks.alias("_toks"))
    n = F.size("_toks")
    starts = F.when(
        n > 0, F.sequence(F.lit(0), (n - 1) - ((n - 1) % stride), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    d = d.select(
        id_col,
        "_toks",
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    chunk = F.slice(F.col("_toks"), F.col("start_tok") + 1, chunk_tokens)
    return d.select(
        id_col,
        F.col("chunk_idx").cast("int"),
        F.col("start_tok").cast("int"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def context_windows(
    transcripts: DataFrame,
    k: int = 3,
    target_role: str = "assistant",
    sep: str = "\n",
) -> DataFrame:
    """-> (conv_id, turn_idx, context, target) for every turn whose role
    is ``target_role``: context = the previous <= k turns rendered as
    'role: text' joined by ``sep`` (in turn order), target = the turn's
    own text. First-turn targets get an empty context.

    One window spec over (conv_id ordered by turn_idx) — the only
    shuffle is conversation-keyed, the pipeline's native partitioning.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-k, -1)
    )
    rendered: Column = F.concat_ws(": ", F.col("role"), F.col("text"))
    ctx = F.array_join(F.collect_list(rendered).over(w), sep)
    out = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        "role",
        "text",
        ctx.alias("context"),
    )
    return out.filter(F.col("role") == target_role).select(
        "conv_id",
        "turn_idx",
        "context",
        F.col("text").alias("target"),
    )
