"""TextTiling topic segmentation over long texts / transcripts.

Hearst, "TextTiling: Segmenting text into multi-paragraph subtopic
passages" (Computational Linguistics 1997): break a text into
token-sequences of ``w`` tokens, score every GAP between adjacent
sequences by the lexical-cohesion similarity of the ``k`` sequences on
each side, convert the similarity valley at each gap into a DEPTH score
against the neighboring peaks, and place boundaries where depth clears a
corpus-free per-document threshold (mean + sd/2 of that document's own
depths). The training-data use is segmenting long agent transcripts /
crawled documents into topically coherent episodes before chunking —
the cohesion-aware alternative to the fixed-stride `examples.
sliding_chunks`.

Determinism discipline: block vectors are exact integer token counts;
``cos_micro = round(dot / sqrt(l2 * r2) * 1e6)`` is a fixed IEEE op
chain (sqrt is correctly rounded, products stay far under 2^53), depth
is integer subtraction of micro values against WINDOWED peak maxima
(Hearst's hill-climbing replaced by a fixed ``hp``-gap peak window — the
bounded deterministic recast, same convention as the bounded-round
unrolls elsewhere), and the boundary threshold is
``round(mean + 0.5 * sqrt(max(var, 0)))`` computed with one pinned op
order in both engines. The driver oracle replays every step in SQL.

Scale: every shuffle is keyed by (doc, gap) or doc — the gap fan-out per
token row is the constant ``k`` (one explode), peak windows and the
threshold aggregate are per-document. Nothing pair-scale, nothing
driver-side; documents parallelize freely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fel_spark.functions.text import normalize_tokens

__all__ = ["text_tiles"]


def text_tiles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 20,
    k: int = 2,
    hp: int = 3,
) -> DataFrame:
    """Score every inter-sequence gap of every document -> one row per
    gap: (``id``, ``gap``, ``cos_micro``, ``depth_micro``,
    ``threshold_micro``, ``is_boundary``). ``w`` = tokens per sequence,
    ``k`` = sequences per comparison block, ``hp`` = peak-window width
    in gaps. Documents with fewer than two sequences emit nothing."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(normalize_tokens(F.col(text_col))).alias("pos", "tok"),
    ).select("id", F.expr(f"pos div {w}").alias("seq"), "tok")
    counts = toks.groupBy("id", "seq", "tok").agg(F.count("*").alias("c"))
    n_seq = counts.groupBy("id").agg((F.max("seq") + 1).alias("n_seq"))
    counts = counts.join(n_seq, "id").filter(F.col("n_seq") >= 2)
    last_gap = F.col("n_seq") - 2
    # sequence s feeds the LEFT block of gaps [s, s+k-1] and the RIGHT
    # block of gaps [s-k, s-1], clamped to the valid gap range
    # guard: Spark's sequence(start, stop) DESCENDS when start > stop, so
    # the final sequence (seq = n_seq-1 > last_gap) must be excluded from
    # left-block fan-out or it leaks into the previous gap's left block
    left = (
        counts.filter(F.col("seq") <= last_gap)
        .select(
            "id",
            "tok",
            "c",
            F.explode(
                F.sequence(
                    F.col("seq"), F.least(F.col("seq") + (k - 1), last_gap)
                )
            ).alias("gap"),
        )
        .groupBy("id", "gap", "tok")
        .agg(F.sum("c").alias("l"))
    )
    right = (
        counts.filter(F.col("seq") >= 1)
        .select(
            "id",
            "tok",
            "c",
            F.explode(
                F.sequence(
                    F.greatest(F.col("seq") - k, F.lit(0)), F.col("seq") - 1
                )
            ).alias("gap"),
        )
        .groupBy("id", "gap", "tok")
        .agg(F.sum("c").alias("r"))
    )
    l2 = left.groupBy("id", "gap").agg(
        F.sum(F.col("l") * F.col("l")).cast("long").alias("l2")
    )
    r2 = right.groupBy("id", "gap").agg(
        F.sum(F.col("r") * F.col("r")).cast("long").alias("r2")
    )
    dot = (
        left.join(right, ["id", "gap", "tok"])
        .groupBy("id", "gap")
        .agg(F.sum(F.col("l") * F.col("r")).cast("long").alias("dot"))
    )
    gaps = (
        l2.join(r2, ["id", "gap"])
        .join(dot, ["id", "gap"], "left")
        .select(
            "id",
            "gap",
            F.round(
                F.coalesce("dot", F.lit(0))
                / F.sqrt(F.col("l2") * F.col("r2"))
                * 1_000_000
            )
            .cast("long")
            .alias("cos_micro"),
        )
    )
    wl = Window.partitionBy("id").orderBy("gap").rowsBetween(-hp, 0)
    wr = Window.partitionBy("id").orderBy("gap").rowsBetween(0, hp)
    depth = gaps.select(
        "id",
        "gap",
        "cos_micro",
        (
            (F.max("cos_micro").over(wl) - F.col("cos_micro"))
            + (F.max("cos_micro").over(wr) - F.col("cos_micro"))
        )
        .cast("long")
        .alias("depth_micro"),
    )
    stats = depth.groupBy("id").agg(
        F.sum("depth_micro").cast("long").alias("_s"),
        F.sum(F.col("depth_micro") * F.col("depth_micro"))
        .cast("long")
        .alias("_sq"),
        F.count("*").cast("long").alias("_n"),
    )
    mean = F.col("_s") / F.col("_n")
    var = F.greatest(F.col("_sq") / F.col("_n") - mean * mean, F.lit(0.0))
    thr = F.round(mean + F.lit(0.5) * F.sqrt(var)).cast("long")
    # stats is one row PER DOCUMENT — corpus-scale, so no broadcast hint:
    # the join is co-partitioned on id with the depth rows
    return (
        depth.join(stats, "id")
        .select(
            "id",
            "gap",
            "cos_micro",
            "depth_micro",
            thr.alias("threshold_micro"),
            F.when(F.col("depth_micro") > thr, 1)
            .otherwise(0)
            .cast("int")
            .alias("is_boundary"),
        )
    )
