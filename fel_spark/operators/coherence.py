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


def _bigrams(s: str) -> set[str]:
    out = set()
    for w in s.split():
        out.update(w[i : i + 2] for i in range(len(w) - 1))
    return out


def _lex_sim(a: str, b: str) -> float:
    """Char-bigram Dice (CompressedSingleFileEntitySimilarityUtil.java:147-164)."""
    pa, pb = _bigrams(a), _bigrams(b)
    if not pa and not pb:
        return 1.0 if a == b else 0.0
    denom = len(pa) + len(pb)
    return 2.0 * len(pa & pb) / denom if denom else 0.0


def _emb_cos(emb, key_a: str, key_b: str) -> float:
    ia, ib = emb.vocab.get(key_a), emb.vocab.get(key_b)
    if ia is None or ib is None:
        return 0.0
    va, vb = emb.matrix[ia], emb.matrix[ib]
    na, nb = np.linalg.norm(va), np.linalg.norm(vb)
    return float(va @ vb / (na * nb)) if na > 0 and nb > 0 else 0.0


def _surface_vec(emb, surface: str) -> np.ndarray | None:
    acc = None
    for t in surface.split():
        i = emb.vocab.get(t)
        if i is not None:
            acc = emb.matrix[i] if acc is None else acc + emb.matrix[i]
    return acc


def _node_score(emb, cand_key: str, cand_name: str, surface: str) -> float:
    ci = emb.vocab.get(cand_key)
    e2w = 0.0
    if ci is not None:
        sv = _surface_vec(emb, surface)
        if sv is not None:
            cv = emb.matrix[ci]
            denom = np.linalg.norm(cv) * np.linalg.norm(sv)
            e2w = float(cv @ sv / denom) if denom > 0 else 0.0
    lex = _lex_sim(cand_name, surface)
    blend = (1 - LEXSIM_LAMBDA) * e2w + LEXSIM_LAMBDA * lex
    return max(np.log(blend) if blend > 0 else DEFAULT_LOG_LIKELIHOOD, DEFAULT_LOG_LIKELIHOOD)


def _lattice(emb, surfaces, cand_lists, reverse: bool) -> np.ndarray:
    n = len(surfaces)
    order = range(n - 1, -1, -1) if reverse else range(n)
    idx = list(order)
    lat = np.full((n, MAXNBEST), DEFAULT_LOG_LIKELIHOOD)
    first = idx[0]
    for j, cand in enumerate(cand_lists[first][:MAXNBEST]):
        lat[first][j] = _node_score(emb, cand["entity_key"], cand["name"], surfaces[first])
    for pos in range(1, n):
        i, prev = idx[pos], idx[pos - 1]
        for j, cand in enumerate(cand_lists[i][:MAXNBEST]):
            node = _node_score(emb, cand["entity_key"], cand["name"], surfaces[i])
            # floor, not None: a previous mention with an empty candidate
            # list must degrade to the floor instead of raising (best + node
            # on None) and killing the whole mapInPandas task.
            best = DEFAULT_LOG_LIKELIHOOD
            for k, pcand in enumerate(cand_lists[prev][:MAXNBEST]):
                e2e = _emb_cos(emb, pcand["entity_key"], cand["entity_key"])
                lex = _lex_sim(pcand["name"], cand["name"])
                blend = (1 - LEXSIM_LAMBDA) * e2e + LEXSIM_LAMBDA * lex
                trans = np.log(blend) if blend > 0 else DEFAULT_LOG_LIKELIHOOD
                cand_score = trans + lat[prev][k]
                if best is None or cand_score > best:
                    best = cand_score
            lat[i][j] = max(best + node, DEFAULT_LOG_LIKELIHOOD)
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
                fwd = _lattice(emb, surfaces, cand_lists, reverse=False)
                bwd = _lattice(emb, surfaces, cand_lists, reverse=True)
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
