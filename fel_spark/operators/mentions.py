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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from fel_spark.functions.text import all_spans, normalize_tokens
from fel_spark.operators import ranking
from fel_spark.operators.context import entity_key_expr, span_context_scores

MAX_SPAN_TOKENS = 4

# elements per segmentation-DP scatter tensor (~128 MB of float64); blocks
# whose (turns x longest-turn x max_span) tensor would exceed this are DP'd
# in contiguous whole-turn chunks (exact same output, bounded allocation)
DP_TENSOR_CAP = 16_000_000


def enumerate_spans(transcripts: DataFrame, max_span: int = MAX_SPAN_TOKENS) -> DataFrame:
    """(conv_id, turn_idx, n_tokens, span, start, length) for every bounded
    contiguous token span. One explode of per-turn span structs — the
    struct array is built once per TURN; a two-step explode would copy the
    token array into every intermediate span row (measured 2x slower)."""
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


def prepare_candidate_dict(
    alias_dict: DataFrame,
    entities: DataFrame,
    top_k: int = 10,
    mu: float = None,
) -> DataFrame:
    """Pre-score and prune the alias dictionary ONCE, dictionary-side.

    FEL's phase-1 ranking (`ContextualRanker.firstPhaseRanking`) depends
    only on alias-level + entity-level counts — never on the span or its
    context. So the phase-1 score, the segmentation log-prob, the length
    prior, and the top-K candidate pruning (survivingCandidates,
    `ContextualRanker.java:30`) are all computable on the dictionary itself
    — thousands of rows — instead of per joined span occurrence (millions).
    This removes the dominant window-sort over the span x candidate table.

    Output: (alias, entity_id, entity_key, phase1, seg_score, len_prior,
    n_cands) — broadcastable (the <3 GB datapack invariant, README.md:10).
    """
    from fel_spark.operators import ranking as R

    mu = R.MU_CONTEXTUAL if mu is None else mu
    stats = R.global_stats(alias_dict)
    scored = R.with_global_stats(alias_dict, stats).withColumn(
        "phase1", R.phase1_score(mu)
    )
    w_rank = Window.partitionBy("alias").orderBy(F.desc("phase1"), F.asc("entity_id"))
    w_alias = Window.partitionBy("alias")
    pruned = (
        scored.withColumn("p1_rank", F.row_number().over(w_rank))
        .withColumn("n_cands", F.count("*").over(w_alias))
        .filter(F.col("p1_rank") <= top_k)
    )
    named = pruned.join(
        entities.select("entity_id", "name"), "entity_id", "left"
    ).withColumn("entity_key", entity_key_expr("name"))
    len_tokens = F.size(F.split(F.col("alias"), " "))
    return named.select(
        "alias",
        "entity_id",
        "entity_key",
        "phase1",
        F.log("phase1").alias("seg_score"),
        (F.lit(1.0) / (1.0 + F.exp(-(len_tokens.cast("double") - 1.0)))).alias(
            "len_prior"
        ),
        "n_cands",
    )


def candidate_mentions(
    spans: DataFrame,
    cand_dict: DataFrame,
    broadcast_dict: bool = True,
) -> DataFrame:
    """Probe every span against the pre-scored dictionary (J8): span = alias.

    The dict is the small side by design -> broadcast hash join (the Spark
    analogue of shipping the datapack to every node with `-files`,
    `utils/RunFELOntheGrid.java:40-41`).
    """
    d = F.broadcast(cand_dict) if broadcast_dict else cand_dict
    # NB: bracket access — `d.alias` is the DataFrame method.
    return spans.join(d, spans["span"] == d["alias"], "inner")


def score_candidates(
    cands: DataFrame,
    transcripts: DataFrame | None = None,
    bc_emb=None,
    scorer: str = "centroid",
    bc_entity_emb=None,
) -> DataFrame:
    """Contextual phase-2 scoring on joined (span x candidate) rows.

    Two-phase pruning (`ContextualRanker.java:51-87`) already happened
    dictionary-side (prepare_candidate_dict). Here only the span-dependent
    part runs: the context-embedding score — and only for AMBIGUOUS aliases
    (n_cands > 1); a single-candidate span has nothing to disambiguate, so
    it skips the pandas UDF entirely (dynamic pruning as a plan split).

    score  = ctx*corr + log(phase1) + len_prior   (phase-2, :127-133)
    seg_score (for the DP) stays the phase-1 log-prob — the DP needs
    negative sub-additive scores (see segment_mentions).

    ``scorer``: "centroid" (default, `CentroidEntityScorer`), "lr"
    (`LREntityScorer`, d+1-wide entity vectors w/ bias) or "custom_lr"
    (`CustomLREntityScorer` — FEL's default contextual path,
    `w2v/LREntityContext.java:26`); ``bc_entity_emb`` supplies the learned
    entity matrix (e.g. embeddings.train_entity_embeddings output),
    defaulting to the word matrix.
    """
    if bc_emb is None or transcripts is None:
        return cands.withColumn("context_score", F.lit(0.0)).withColumn(
            "score", F.col("seg_score") + F.col("len_prior")
        )

    toks_tbl = transcripts.select(
        "conv_id", "turn_idx", normalize_tokens("text").alias("toks")
    )
    with_toks = cands.join(toks_tbl, ["conv_id", "turn_idx"], "left")
    # single plan, no ambig/unambig branch split (a split would recompute
    # the span-explode subtree per branch); the UDF short-circuits rows
    # with n_cands <= 1 internally
    scored = span_context_scores(
        with_toks,
        bc_emb,
        skip_col="n_cands",
        scorer=scorer,
        bc_entity_emb=bc_entity_emb,
    ).drop("toks")
    return scored.withColumn(
        "score",
        F.greatest(F.col("context_score"), F.lit(ranking.MIN_CONTEXT))
        + F.col("seg_score")
        + F.col("len_prior"),
    )


def best_candidate_per_span(scored: DataFrame) -> DataFrame:
    """Argmax candidate per span (CandidateRanker.getHighestRankedEntity,
    `entityranker/CandidateRanker.java:72-86`) — one hash aggregate with
    max_by (no sort window), deterministic entity_id tiebreak."""
    ordering = F.struct(
        F.col("score").alias("s"), (-F.col("entity_id")).alias("tb")
    )
    payload = F.struct("span", "entity_id", "entity_key", "score")
    return (
        scored.groupBy("conv_id", "turn_idx", "start", "length")
        .agg(
            F.max_by(payload, ordering).alias("best"),
            F.max("seg_score").alias("seg_score"),
            F.max("n_tokens").alias("n_tokens"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "start",
            "length",
            F.col("best.span").alias("span"),
            F.col("best.entity_id").alias("entity_id"),
            F.col("best.entity_key").alias("entity_key"),
            F.col("best.score").alias("score"),
            "seg_score",
            "n_tokens",
        )
    )


_SEGMENT_SCHEMA = (
    "conv_id string, turn_idx int, start int, length int, span string, "
    "entity_id int, entity_key string, score double"
)


def segment_mentions(
    best_spans: DataFrame,
    nil_score: float = ranking.NIL_SCORE,
    max_span: int = MAX_SPAN_TOKENS,
    dp_tensor_cap: int = DP_TENSOR_CAP,
) -> DataFrame:
    """Non-overlapping segmentation DP (FastEntityLinker.getBestChunking,
    `FastEntityLinker.java:246-286`).

    m[j] = max over i in [j-max_span, j) of m[i] + s(i, j), where s(i,j) is
    the best alias-candidate score for span [i,j) and the NIL score for an
    unmatched single token; backtracking yields the chosen segmentation.
    Emitted mentions are the chosen alias spans with score > nil_score.
    Every position is reachable through the always-available length-1 NIL
    step, so m[j] is finite for all j — the recurrence never dead-ends.

    Plan shape: the span table stays FLAT — one shuffle co-locates and
    sorts each turn's spans (repartition + sortWithinPartitions), and the
    DP runs as a BATCHED TENSOR recurrence inside mapInPandas: per Arrow
    batch, a (turns x positions x max_span) score tensor is scattered from
    the flat columns, m advances with max_span vectorized maxes per token
    position, and backtracking walks all turns in lockstep (one vector op
    per segmentation step). No per-turn Python, no list-of-struct
    assembly — the former per-turn dict/loop DP was the pipeline's
    single most expensive stage (~8.5 s of a 23 s run at bench scale; the
    tensor form cuts it to the scatter + ~4·N vector ops per batch).
    Turns split across Arrow batch boundaries are carried into the next
    batch (sort guarantees group contiguity within a partition).
    """
    flat = best_spans.select(
        "conv_id", "turn_idx", "n_tokens", "start", "length", "span",
        "entity_id", "entity_key", "score", "seg_score",
    ).repartition("conv_id", "turn_idx").sortWithinPartitions("conv_id", "turn_idx")

    def dp_block(pdf: pd.DataFrame) -> pd.DataFrame:
        # the dense (turns x positions x max_span) scatter tensors below
        # size with the LONGEST turn in the block: one pathological
        # multi-k-token turn sharing a batch with thousands of short ones
        # would allocate T*N_max*L cells. The DP is per-turn independent,
        # so split oversized blocks into contiguous whole-turn chunks
        # (rows are sorted, so codes are non-decreasing) under an element
        # cap — exact same output, bounded allocation.
        key = pdf["conv_id"].astype(str) + "\x00" + pdf["turn_idx"].astype(str)
        codes, _ = pd.factorize(key)
        if len(codes):
            t_count = int(codes.max()) + 1
            per_turn = np.zeros(t_count, dtype=np.int64)
            np.maximum.at(per_turn, codes, pdf["n_tokens"].to_numpy(np.int64))
            cap = int(dp_tensor_cap)
            if t_count * int(per_turn.max()) * int(max_span) > cap:
                t_starts = np.searchsorted(codes, np.arange(t_count), "left")
                t_ends = np.searchsorted(codes, np.arange(t_count), "right")
                outs, t0 = [], 0
                while t0 < t_count:
                    n_max, t1 = 0, t0
                    while t1 < t_count:
                        nm = max(n_max, int(per_turn[t1]))
                        if t1 > t0 and (t1 - t0 + 1) * nm * int(max_span) > cap:
                            break
                        n_max, t1 = nm, t1 + 1
                    outs.append(
                        _dp_core(
                            pdf.iloc[t_starts[t0] : t_ends[t1 - 1]].reset_index(
                                drop=True
                            )
                        )
                    )
                    t0 = t1
                return pd.concat(outs, ignore_index=True)
        return _dp_core(pdf)

    def _dp_core(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["conv_id"].astype(str) + "\x00" + pdf["turn_idx"].astype(str)
        codes, _ = pd.factorize(key)  # order-preserving group ids
        T = int(codes.max()) + 1
        rows = codes.astype(np.int64)
        starts = pdf["start"].to_numpy(np.int64)  # 1-based
        lens = pdf["length"].to_numpy(np.int64)
        segs = pdf["seg_score"].to_numpy(np.float64)
        n_tok = np.zeros(T, dtype=np.int64)
        np.maximum.at(n_tok, rows, pdf["n_tokens"].to_numpy(np.int64))

        N = int(n_tok.max()) if T else 0
        L = int(max_span)
        NEG = -1.0e300
        # drop out-of-range spans BEFORE the scatter: the dict-based DP
        # stored them but never consulted keys with ln > max_span or
        # start+ln > n_tokens, so dropping is semantically identical (and
        # keeps the tensor indices in bounds for hostile inputs)
        ok = (
            (lens >= 1)
            & (lens <= L)
            & (starts >= 1)
            & (starts - 1 + lens <= n_tok[rows])
        )
        oki = np.nonzero(ok)[0]
        # score/payload tensors: (turn, start0, len-1). best_candidate_per_span
        # guarantees (turn, start, length) uniqueness, so scatter is exact;
        # the belt-and-braces tie rule for duplicate keys is max seg_score
        # (ascending lexsort -> last write wins)
        order = oki[np.lexsort((segs[oki], lens[oki], starts[oki], rows[oki]))]
        S = np.full((T, N, L), NEG)
        IDX = np.full((T, N, L), -1, dtype=np.int64)
        S[rows[order], starts[order] - 1, lens[order] - 1] = segs[order]
        IDX[rows[order], starts[order] - 1, lens[order] - 1] = order

        m = np.full((T, N + 1), NEG)
        m[:, 0] = 0.0
        bl = np.zeros((T, N + 1), dtype=np.int64)  # chosen length at j
        for j in range(1, N + 1):
            lmax = min(L, j)
            opts = np.empty((T, lmax))
            for ln in range(1, lmax + 1):
                s = S[:, j - ln, ln - 1]
                if ln == 1:
                    # no length-1 candidate -> NIL step (candidate score is
                    # used even when below nil_score, as in the reference)
                    s = np.where(s > NEG / 2, s, nil_score)
                opts[:, ln - 1] = m[:, j - ln] + s
            # first max == smallest ln, matching the strict-> scan order
            best_ln = np.argmax(opts, axis=1)
            m[:, j] = opts[np.arange(T), best_ln]
            bl[:, j] = best_ln + 1
        # positions past a turn's own n_tokens exist only for tensor
        # uniformity; backtracking starts at each turn's n_tokens
        chosen: list[np.ndarray] = []
        tids = np.arange(T)
        j = n_tok.copy()
        while (j > 0).any():
            act = j > 0
            ln = np.where(act, bl[tids, np.maximum(j, 1)], 0)
            i = j - ln
            has = act & (ln > 0)
            idxs = IDX[tids[has], i[has], ln[has] - 1]
            chosen.append(idxs[idxs >= 0])
            j = np.where(has, i, 0)
        sel = np.concatenate(chosen) if chosen else np.empty(0, dtype=np.int64)
        sel = sel[segs[sel] > nil_score]
        out = pdf.iloc[sel][
            ["conv_id", "turn_idx", "start", "length", "span", "entity_id",
             "entity_key", "score"]
        ].copy()
        out["turn_idx"] = out["turn_idx"].astype("int32")
        out["start"] = out["start"].astype("int32")
        out["length"] = out["length"].astype("int32")
        out["entity_id"] = out["entity_id"].astype("int32")
        return out.reset_index(drop=True)

    def run_dp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the final (possibly batch-straddling) turn
            key = pdf["conv_id"].astype(str) + "\x00" + pdf["turn_idx"].astype(str)
            kv = key.to_numpy()
            first_last = int(np.argmax(kv == kv[-1]))
            carry = pdf.iloc[first_last:]
            work = pdf.iloc[:first_last]
            if len(work):
                yield dp_block(work)
        if carry is not None and len(carry):
            yield dp_block(carry.reset_index(drop=True))

    return flat.mapInPandas(run_dp, schema=_SEGMENT_SCHEMA)


def segment_mentions_max_iterative(
    best_spans: DataFrame,
    nil_score: float = ranking.NIL_SCORE,
    max_span: int = MAX_SPAN_TOKENS,
) -> DataFrame:
    """L8: the reference's ALTERNATIVE segmentation policy
    (`FastEntityLinker.getBestChunkingMaxIterativeV2`, :302-398): instead of
    maximizing the SUM of chunk scores (segment_mentions), maximize the MAX —
    maxScores[i][j] = best over splits k of max(score(chunk), maxScores of
    the rest), then follow the split trail left to right. Same input/output
    contract as segment_mentions; spans longer than ``max_span`` score nil
    (the reference scores all lengths; our span enumeration is bounded, so
    the table is nil beyond the bound).

    Spark shape identical to L7: one shuffle to group spans per turn, DP
    row-wise inside mapInPandas.
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

                def s(i: int, j: int) -> float:
                    # score of chunk starting at j spanning i+1 tokens
                    ent = table.get((j, i + 1))
                    return ent[0] if ent is not None else nil_score

                # maxScores[i][j]: best achievable max-chunk-score over the
                # subsequence of length i+1 starting at j (:349-376)
                m = [[nil_score] * n for _ in range(n)]
                splits = [[1] * n for _ in range(n)]
                for j in range(n):
                    m[0][j] = s(0, j)
                for i in range(1, n):
                    for j in range(0, n - i):
                        max_s = s(i, j)
                        best_split = i + 1
                        for k in range(i):
                            sc = max(s(k, j), m[i - k - 1][j + k + 1])
                            if sc > max_s:
                                max_s = sc
                                best_split = k + 1
                        m[i][j] = max_s
                        splits[i][j] = best_split
                # follow the trail (:379-398)
                i, j = n - 1, 0
                while j <= n - 1 and i >= 0:
                    jump = splits[i][j]
                    ent = table.get((j, jump))
                    if ent is not None and ent[0] > nil_score:
                        out_rows.append(
                            (conv_id, int(turn_idx), j + 1, jump,
                             ent[1], ent[2], ent[3], ent[4])
                        )
                    j += jump
                    i -= jump
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "conv_id", "turn_idx", "start", "length",
                    "span", "entity_id", "entity_key", "score",
                ],
            )

    return grouped.mapInPandas(run_dp, schema=_SEGMENT_SCHEMA)


def link_mentions(
    transcripts: DataFrame,
    alias_dict: DataFrame,
    entities: DataFrame,
    bc_emb=None,
    max_span: int = MAX_SPAN_TOKENS,
    cand_dict: DataFrame | None = None,
) -> DataFrame:
    """transcripts -> linked mentions (one row per chosen mention).

    Output: conv_id, turn_idx, start, length, span, entity_id, entity_key,
    score, mention_id.

    ``cand_dict`` injects a pre-built `prepare_candidate_dict` result
    (persist it once per job, the FEL load-datapack-at-startup analogue,
    `FastEntityLinker.java:474`) so repeated linking runs don't re-score
    and re-sort the dictionary.
    """
    spans = enumerate_spans(transcripts, max_span)
    if cand_dict is None:
        cand_dict = prepare_candidate_dict(alias_dict, entities)
    cands = candidate_mentions(spans, cand_dict)
    scored = score_candidates(cands, transcripts=transcripts, bc_emb=bc_emb)
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
