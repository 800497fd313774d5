"""Conversation-level coherence: forward-backward candidate re-ranking.

Re-expresses `CoherentEntityLinker.dynamicProgrammingSearch` +
`bestForwardPath/bestBackwardPath/bestMergedPath`
(`CoherentEntityLinker.java:152-315`): a lattice over the conversation's
mentions — rows = mentions in turn order, columns = n-best candidates —
where node score = log((1-lambda)*entity2surface_emb + lambda*lexical_sim)
and transition score = log((1-lambda)*entity2entity_emb +
lambda*lexical(prev_name, cand_name)); both floored at DEFAULT_LOG_LIKELIHOOD
(-10000). Run forward and backward, sum the lattices, argmax per mention
(`:264-315`).

Constants mirror the reference: MAXNBEST=10, LEXSIM_LAMBDA=0.5, floor -10000
(`CoherentEntityLinker.java:46-70`).

Spark shape: one shuffle groups each conversation's mentions+candidates
into a row (collect_list ordered by turn), then the DP runs row-wise inside
mapInPandas — sequential per conversation, parallel across conversations
(the same pattern as the segmentation DP). This is the high-fidelity
alternative to connected components for short conversations; the ER
pipeline's CC pass is the scale path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MAXNBEST = 10  # CoherentEntityLinker.java:46
LEXSIM_LAMBDA = 0.5  # :58
DEFAULT_LOG_LIKELIHOOD = -10000.0  # :70


class _DiceTable:
    """Per-conversation lexical cache: ONE batched multiset char-bigram Dice
    matrix over the conversation's distinct strings (candidate names +
    surfaces), computed with the vectorized kernel
    (`sim.bigram_multiset_dice_matrix` — binary-level matmuls, faithful to
    `CompressedSingleFileEntitySimilarityUtil.lexicalSimilarity`, :147-164).
    Transition/node loops then do O(1) matrix lookups — no per-pair Python
    string ops inside the lattice."""

    def __init__(self, strings):
        from fel_spark.functions.sim import bigram_multiset_dice_matrix

        self.idx = {}
        for s in strings:
            if s not in self.idx:
                self.idx[s] = len(self.idx)
        uniq = list(self.idx)
        self.D = bigram_multiset_dice_matrix(uniq, uniq)

    def rows(self, strs: list[str]) -> np.ndarray:
        return np.asarray([self.idx[s] for s in strs], dtype=np.int64)

    def sim(self, a: str, b: str) -> float:
        return float(self.D[self.idx[a], self.idx[b]])


def _surface_vec(emb, surface: str) -> np.ndarray | None:
    acc = None
    for t in surface.split():
        i = emb.vocab.get(t)
        if i is not None:
            acc = emb.matrix[i] if acc is None else acc + emb.matrix[i]
    return acc


def _node_score(
    emb, dice: _DiceTable, cand_key: str, cand_name: str, surface: str, sv
) -> float:
    """``sv`` is the surface's summed token vector, computed ONCE per
    mention by the caller (it is identical for all MAXNBEST candidates)."""
    ci = emb.vocab.get(cand_key)
    e2w = 0.0
    if ci is not None and sv is not None:
        cv = emb.matrix[ci]
        denom = np.linalg.norm(cv) * np.linalg.norm(sv)
        e2w = float(cv @ sv / denom) if denom > 0 else 0.0
    lex = dice.sim(cand_name, surface)
    blend = (1 - LEXSIM_LAMBDA) * e2w + LEXSIM_LAMBDA * lex
    return max(np.log(blend) if blend > 0 else DEFAULT_LOG_LIKELIHOOD, DEFAULT_LOG_LIKELIHOOD)


def _pair_trans_matrix(emb, dice: _DiceTable, prev_cands, cands) -> np.ndarray:
    """Transition score matrix (len(prev) x len(cands)): log of the blend of
    entity-entity embedding cosine and lexical char-bigram Dice, floored.
    Embedding cosines come from ONE gather + matmul; lexical Dice is a
    sub-matrix gather from the conversation's precomputed _DiceTable —
    nothing per-pair in Python."""
    kp = [c["entity_key"] for c in prev_cands]
    kc = [c["entity_key"] for c in cands]
    if len(emb.matrix) == 0:
        # all-OOV matrix (e.g. lexical-only lattice): cosine term is 0
        e2e = np.zeros((len(prev_cands), len(cands)))
    else:
        ip = emb.ids_for(np.asarray(kp, dtype=object))
        ic = emb.ids_for(np.asarray(kc, dtype=object))
        vp = emb.matrix[np.clip(ip, 0, None)].astype(np.float64)
        vp[ip < 0] = 0.0
        vc = emb.matrix[np.clip(ic, 0, None)].astype(np.float64)
        vc[ic < 0] = 0.0
        np_n = np.linalg.norm(vp, axis=1)
        nc_n = np.linalg.norm(vc, axis=1)
        denom = np.outer(np_n, nc_n)
        with np.errstate(divide="ignore", invalid="ignore"):
            e2e = np.where(denom > 0, (vp @ vc.T) / np.where(denom == 0, 1, denom), 0.0)
    lex = dice.D[
        np.ix_(
            dice.rows([p["name"] for p in prev_cands]),
            dice.rows([c["name"] for c in cands]),
        )
    ]
    blend = (1 - LEXSIM_LAMBDA) * e2e + LEXSIM_LAMBDA * lex
    with np.errstate(divide="ignore"):
        trans = np.where(blend > 0, np.log(np.where(blend <= 0, 1, blend)), DEFAULT_LOG_LIKELIHOOD)
    return trans


def _lattice(emb, dice: _DiceTable, surfaces, cand_lists, reverse: bool) -> np.ndarray:
    n = len(surfaces)
    order = range(n - 1, -1, -1) if reverse else range(n)
    idx = list(order)
    lat = np.full((n, MAXNBEST), DEFAULT_LOG_LIKELIHOOD)
    svs = [_surface_vec(emb, s) for s in surfaces]  # once per mention
    first = idx[0]
    for j, cand in enumerate(cand_lists[first][:MAXNBEST]):
        lat[first][j] = _node_score(
            emb, dice, cand["entity_key"], cand["name"], surfaces[first], svs[first]
        )
    for pos in range(1, n):
        i, prev = idx[pos], idx[pos - 1]
        cands = cand_lists[i][:MAXNBEST]
        pcands = cand_lists[prev][:MAXNBEST]
        if not cands:
            continue
        nodes = np.array(
            [
                _node_score(emb, dice, c["entity_key"], c["name"], surfaces[i], svs[i])
                for c in cands
            ]
        )
        if pcands:
            trans = _pair_trans_matrix(emb, dice, pcands, cands)  # (|prev|, |cands|)
            best = (trans + lat[prev][: len(pcands), None]).max(axis=0)
        else:
            # floor, not None/NaN: a previous mention with an empty candidate
            # list degrades to the floor instead of killing the task
            best = np.full(len(cands), DEFAULT_LOG_LIKELIHOOD)
        lat[i][: len(cands)] = np.maximum(best + nodes, DEFAULT_LOG_LIKELIHOOD)
    return lat


COHERENT_SCHEMA = (
    "conv_id string, mention_id string, surface string, entity_id int, "
    "entity_key string, coherence_score double"
)


def coherent_assignments(mentions_nbest: DataFrame, bc_emb) -> DataFrame:
    """Input: one row per mention with columns (conv_id, mention_id,
    order_idx, surface, candidates array<struct<entity_id:int,
    entity_key:string, name:string>>). Output: the coherent (forward +
    backward merged) entity per mention (`bestMergedPath`, :264-315)."""
    grouped = mentions_nbest.groupBy("conv_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct("order_idx", "mention_id", "surface", "candidates")
            )
        ).alias("ms")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        emb = bc_emb.value
        for pdf in batches:
            rows = []
            for conv_id, ms in zip(pdf["conv_id"], pdf["ms"]):
                surfaces = [m["surface"] for m in ms]
                cand_lists = [list(m["candidates"]) for m in ms]
                if not surfaces:
                    continue
                dice = _DiceTable(
                    surfaces
                    + [c["name"] for cl in cand_lists for c in cl[:MAXNBEST]]
                )
                fwd = _lattice(emb, dice, surfaces, cand_lists, reverse=False)
                bwd = _lattice(emb, dice, surfaces, cand_lists, reverse=True)
                merged = fwd + bwd
                for i, m in enumerate(ms):
                    cl = cand_lists[i][:MAXNBEST]
                    if not cl:
                        continue
                    j = int(np.argmax(merged[i][: len(cl)]))
                    rows.append(
                        (
                            conv_id,
                            m["mention_id"],
                            surfaces[i],
                            int(cl[j]["entity_id"]),
                            cl[j]["entity_key"],
                            float(merged[i][j]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id",
                    "mention_id",
                    "surface",
                    "entity_id",
                    "entity_key",
                    "coherence_score",
                ],
            )

    return grouped.mapInPandas(gen, schema=COHERENT_SCHEMA)
