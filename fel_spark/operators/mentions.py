"""Mention extraction: span enumeration, alias-dictionary candidate
generation, contextual ranking, and non-overlapping segmentation DP.

Reference lifecycle (`FastEntityLinker.java:418-439` span enumeration;
`hash/QuasiSuccinctEntityHash.java:79-126` alias lookup;
`FastEntityLinker.java:246-286` best-chunking DP):

  tokens -> all spans (bounded length) -> alias dict probe -> per-candidate
  scores -> per-span best candidate -> DP picks the non-overlapping
  segmentation maximizing the summed span scores (unmatched tokens get the
  NIL score) -> linked mentions.

Spark restatement: explode spans (codegen) -> join the alias dict (broadcast
— it is the <3 GB datapack analogue) -> column-arithmetic ranking -> window
argmax per span -> collect spans per turn -> DP inside mapInPandas (the DP is
inherently sequential per turn but embarrassingly parallel across turns).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from fel_spark.functions.text import all_spans, normalize_tokens
from fel_spark.operators import ranking
from fel_spark.operators.context import entity_key_expr, span_context_scores

MAX_SPAN_TOKENS = 4


def enumerate_spans(transcripts: DataFrame, max_span: int = MAX_SPAN_TOKENS) -> DataFrame:
    """(conv_id, turn_idx, n_tokens, span, start, length) for every bounded
    contiguous token span. Pure codegen — no UDF, no shuffle."""
    toks = transcripts.select(
        "conv_id",
        "turn_idx",
        normalize_tokens("text").alias("toks"),
    ).withColumn("n_tokens", F.size("toks"))
    return (
        toks.filter(F.col("n_tokens") > 0)
        .select(
            "conv_id",
            "turn_idx",
            "n_tokens",
            F.explode(all_spans(F.col("toks"), max_span)).alias("sp"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "n_tokens",
            F.col("sp.span").alias("span"),
            F.col("sp.start").alias("start"),
            F.col("sp.length").alias("length"),
        )
    )


def candidate_mentions(
    spans: DataFrame,
    alias_dict: DataFrame,
    entities: DataFrame,
    broadcast_dict: bool = True,
) -> DataFrame:
    """Probe every span against the alias dictionary (J8): span = alias key.

    The dict is the small side by design -> broadcast hash join (the Spark
    analogue of shipping the datapack to every node with `-files`,
    `utils/RunFELOntheGrid.java:40-41`).
    """
    dict_named = alias_dict.join(
        entities.select("entity_id", "name"), "entity_id", "left"
    ).withColumn("entity_key", entity_key_expr("name"))
    if broadcast_dict:
        dict_named = F.broadcast(dict_named)
    # NB: bracket access — `dict_named.alias` is the DataFrame method.
    return spans.join(dict_named, spans["span"] == dict_named["alias"], "inner")


def score_candidates(
    cands: DataFrame,
    stats: DataFrame,
    transcripts: DataFrame | None = None,
    bc_emb=None,
) -> DataFrame:
    """Phase-1 mixture score, then (optionally) the contextual second phase.

    Two-phase pruning (`ContextualRanker.java:51-87`): the expensive
    embedding score only runs on the top-N phase-1 survivors per span —
    a filter between two scoring stages, the plan shape Catalyst can't
    invent on its own.
    """
    scored = (
        ranking.with_global_stats(cands, stats)
        .withColumn("phase1", ranking.phase1_score())
        # segmentation score: log-prob of the span's best candidate. The DP
        # must see negative, sub-additive scores (FEL's getBestChunking runs
        # on ProbabilityRanker log-probs) — the phase-2 context score is
        # positive-valued and would bias the DP toward many short spans.
        .withColumn("seg_score", F.log("phase1"))
    )
    if bc_emb is None or transcripts is None:
        return scored.withColumn("score", F.log("phase1")).drop("SQEF", "SLET", "NE")

    # phase-2 pruning: keep top-N candidates per span by phase-1 score
    w = Window.partitionBy("conv_id", "turn_idx", "start", "length").orderBy(
        F.desc("phase1"), F.asc("entity_id")
    )
    survivors = scored.withColumn("p1_rank", F.row_number().over(w)).filter(
        F.col("p1_rank") <= 10
    )

    toks_tbl = transcripts.select(
        "conv_id", "turn_idx", normalize_tokens("text").alias("toks")
    )
    with_ctx = survivors.join(toks_tbl, ["conv_id", "turn_idx"], "left")
    with_ctx = span_context_scores(with_ctx, bc_emb)
    return with_ctx.withColumn(
        "score",
        ranking.phase2_score(F.col("phase1"), F.col("context_score"), F.col("length")),
    ).drop("SQEF", "SLET", "NE", "toks", "p1_rank")


def best_candidate_per_span(scored: DataFrame) -> DataFrame:
    """Argmax candidate per span (CandidateRanker.getHighestRankedEntity,
    `entityranker/CandidateRanker.java:72-86`) — window top-1 with a
    deterministic tiebreak."""
    span_w = Window.partitionBy("conv_id", "turn_idx", "start", "length")
    w = span_w.orderBy(F.desc("score"), F.asc("entity_id"))
    return (
        scored.withColumn("seg_score", F.max("seg_score").over(span_w))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


_SEGMENT_SCHEMA = (
    "conv_id string, turn_idx int, start int, length int, span string, "
    "entity_id int, entity_key string, score double"
)


def segment_mentions(
    best_spans: DataFrame,
    nil_score: float = ranking.NIL_SCORE,
    max_span: int = MAX_SPAN_TOKENS,
) -> DataFrame:
    """Non-overlapping segmentation DP (FastEntityLinker.getBestChunking,
    `FastEntityLinker.java:246-286`).

    m[j] = max over i in [j-max_span, j) of m[i] + s(i, j), where s(i,j) is
    the best alias-candidate score for span [i,j) and the NIL score for an
    unmatched single token; backtracking yields the chosen segmentation.
    Emitted mentions are the chosen alias spans with score > nil_score.

    Plan shape: one shuffle to group spans per turn (collect_list), then the
    DP runs row-wise inside mapInPandas — sequential per turn, parallel
    across turns. No per-group Arrow round-trip (applyInPandas) needed.
    """
    grouped = best_spans.groupBy("conv_id", "turn_idx").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.collect_list(
            F.struct(
                "start", "length", "span", "entity_id", "entity_key", "score",
                "seg_score",
            )
        ).alias("spans"),
    )

    def run_dp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for conv_id, turn_idx, n_tokens, spans in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["n_tokens"], pdf["spans"]
            ):
                n = int(n_tokens)
                # span table: (start-1, length) -> (score, span, entity, key)
                # DP runs on seg_score (log-prob); the carried tuple keeps
                # the phase-2 score + entity of the span's best candidate.
                table: dict[tuple[int, int], tuple] = {}
                for sp in spans:
                    key = (int(sp["start"]) - 1, int(sp["length"]))
                    cur = table.get(key)
                    if cur is None or sp["seg_score"] > cur[0]:
                        table[key] = (
                            float(sp["seg_score"]),
                            sp["span"],
                            int(sp["entity_id"]),
                            sp["entity_key"],
                            float(sp["score"]),
                        )
                NEG = float("-inf")
                m = [0.0] + [NEG] * n
                back: list[tuple[int, int] | None] = [None] * (n + 1)
                for j in range(1, n + 1):
                    for ln in range(1, min(max_span, j) + 1):
                        i = j - ln
                        if m[i] == NEG:
                            continue
                        ent = table.get((i, ln))
                        if ent is not None:
                            s = ent[0]
                        elif ln == 1:
                            s = nil_score
                        else:
                            continue
                        if m[i] + s > m[j]:
                            m[j] = m[i] + s
                            back[j] = (i, ln)
                # backtrack
                j = n
                while j > 0 and back[j] is not None:
                    i, ln = back[j]
                    ent = table.get((i, ln))
                    if ent is not None and ent[0] > nil_score:
                        out_rows.append(
                            (
                                conv_id,
                                int(turn_idx),
                                i + 1,
                                ln,
                                ent[1],
                                ent[2],
                                ent[3],
                                ent[4],
                            )
                        )
                    j = i
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "conv_id",
                    "turn_idx",
                    "start",
                    "length",
                    "span",
                    "entity_id",
                    "entity_key",
                    "score",
                ],
            )

    return grouped.mapInPandas(run_dp, schema=_SEGMENT_SCHEMA)


def link_mentions(
    transcripts: DataFrame,
    alias_dict: DataFrame,
    entities: DataFrame,
    bc_emb=None,
    max_span: int = MAX_SPAN_TOKENS,
) -> DataFrame:
    """transcripts -> linked mentions (one row per chosen mention).

    Output: conv_id, turn_idx, start, length, span, entity_id, entity_key,
    score, mention_id.
    """
    spans = enumerate_spans(transcripts, max_span)
    stats = ranking.global_stats(alias_dict)
    cands = candidate_mentions(spans, alias_dict, entities)
    scored = score_candidates(cands, stats, transcripts=transcripts, bc_emb=bc_emb)
    best = best_candidate_per_span(scored)
    mentions = segment_mentions(best, max_span=max_span)
    return mentions.withColumn(
        "mention_id",
        F.concat_ws(
            "#",
            "conv_id",
            F.col("turn_idx").cast("string"),
            F.col("start").cast("string"),
        ),
    )
