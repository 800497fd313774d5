"""Quantized embedding matrix + context-centroid scoring.

Spark-first restatement of FEL's compressed-embedding kernel:

- the Golomb-coded `Word2VecCompress` store (`it/cnr/isti/hpc/
  Word2VecCompress.java:40-123`) becomes an int16-quantized NumPy matrix
  broadcast to executors; dequantization is `(v + 0.5*sign(v))/q`
  (`Word2VecCompress.java:96-97`).
- the centroid scorer (`it/cnr/isti/hpc/CentroidEntityScorer.java:30-55`):
  context centroid = count-weighted sum of word vectors; score =
  <entity_vec, centroid> / ||centroid||  (NOT normalized by the entity
  norm — reference behavior).
- per-query score caching (`w2v/CentroidEntityContext.java:91-99`) is
  replaced by dedup-before-score: we score distinct (turn, entity) pairs.

All scoring runs inside Arrow-batched pandas UDFs on NumPy (the manual
4-way-unrolled dot of `it/cnr/isti/hpc/LinearAlgebra.java:20-36` is exactly
what BLAS gives us).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from fel_spark.functions.text import normalize_tokens

QUANT_Q_DEFAULT = 9


class EmbeddingMatrix:
    """Driver-side vocab -> row-id dict + dequantized float32 matrix.

    Must stay broadcast-sized (the reference requires the datapack to fit
    per node, README.md:10). At 100 TB input this is a *dimension* artifact
    — its size scales with the entity vocabulary, not the corpus.
    """

    def __init__(self, vocab: dict[str, int], matrix: np.ndarray):
        self.vocab = vocab
        self.matrix = matrix.astype(np.float32)
        self._index: pd.Index | None = None  # built lazily per process
        self._index_ids: np.ndarray | None = None

    def ids_for(self, tokens) -> np.ndarray:
        """Vectorized vocab lookup: array-like of str -> row ids (-1 = OOV).

        Uses a cached pandas hash Index (C-level get_indexer) instead of a
        per-token Python dict probe — this is what keeps the scoring UDFs
        free of Python loops.
        """
        if self._index is None:
            self._index = pd.Index(list(self.vocab.keys()))
            self._index_ids = np.fromiter(
                self.vocab.values(), dtype=np.int64, count=len(self.vocab)
            )
        if len(tokens) == 0:
            return np.empty(0, dtype=np.int64)
        if len(self.vocab) == 0:
            # all-OOV: indexing an empty id array with -1 would raise
            return np.full(len(tokens), -1, dtype=np.int64)
        pos = self._index.get_indexer(np.asarray(tokens, dtype=object))
        return np.where(pos >= 0, self._index_ids[pos], -1)

    @classmethod
    def from_quantized(cls, keys: list[str], rows: list[list[int]], q: float = QUANT_Q_DEFAULT):
        m = np.asarray(rows, dtype=np.float32)
        deq = np.where(m != 0, (m + 0.5 * np.sign(m)) / q, 0.0).astype(np.float32)
        return cls({k: i for i, k in enumerate(keys)}, deq)

    @classmethod
    def from_spark(cls, emb_df: DataFrame, q: float = QUANT_Q_DEFAULT):
        pdf = emb_df.select("key", "vec").toPandas()
        return cls.from_quantized(pdf["key"].tolist(), pdf["vec"].tolist(), q)

    def lookup(self, key: str) -> np.ndarray | None:
        i = self.vocab.get(key)
        return None if i is None else self.matrix[i]


def broadcast_embeddings(spark: SparkSession, emb: EmbeddingMatrix):
    return spark.sparkContext.broadcast(emb)


def turn_centroids(transcripts: DataFrame, bc_emb, text_col: str = "text") -> DataFrame:
    """(conv_id, turn_idx, centroid array<float>, centroid_norm double).

    Count-weighted centroid of the turn's token vectors (OOV tokens skipped),
    mirroring CentroidScorerContext (CentroidEntityScorer.java:36-49).
    Computed via mapInPandas — one Arrow batch in, NumPy gather + add.
    """
    toks = transcripts.select(
        "conv_id", "turn_idx", normalize_tokens(text_col).alias("toks")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        emb = bc_emb.value
        dim = emb.matrix.shape[1]
        for pdf in batches:
            n = len(pdf)
            lens = np.fromiter(
                ((len(t) if t is not None else 0) for t in pdf["toks"]),
                dtype=np.int64,
                count=n,
            )
            cents = np.zeros((n, dim), dtype=np.float32)
            nz = np.flatnonzero(lens > 0)
            if len(nz):
                # one flattened id-map + gather + segment-sum for the batch
                flat = np.concatenate([np.asarray(pdf["toks"].iat[i]) for i in nz])
                ids = emb.ids_for(flat)
                vecs = emb.matrix[np.clip(ids, 0, None)]
                vecs[ids < 0] = 0.0
                offsets = np.zeros(len(nz), dtype=np.int64)
                np.cumsum(lens[nz][:-1], out=offsets[1:])
                cents[nz] = np.add.reduceat(vecs, offsets, axis=0)
            norms = np.linalg.norm(cents, axis=1).astype(np.float64)
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "centroid": list(cents),
                    "centroid_norm": norms,
                }
            )

    return toks.mapInPandas(
        gen,
        schema="conv_id string, turn_idx int, centroid array<float>, centroid_norm double",
    )


def entity_context_scores(
    pairs: DataFrame,
    bc_emb,
    entity_key_col: str = "entity_key",
    centroid_col: str = "centroid",
    out_col: str = "context_score",
) -> DataFrame:
    """Score = <entity_vec, centroid>/||centroid|| for each row.

    ``pairs`` must carry the entity embedding key and the turn centroid.
    Entities missing from the matrix score 0 (OOV rule,
    `CompressedSingleFileEntitySimilarityUtil.java:40-47`).
    """
    dim = bc_emb.value.matrix.shape[1]

    @F.pandas_udf("double")
    def _score(keys: pd.Series, cents: pd.Series) -> pd.Series:
        emb = bc_emb.value
        n = len(keys)
        ids = np.array([emb.vocab.get(k, -1) for k in keys], dtype=np.int64)
        cmat = np.zeros((n, dim), dtype=np.float32)
        for i, c in enumerate(cents):
            if c is not None and len(c) == dim:
                cmat[i] = c
        evecs = np.zeros((n, dim), dtype=np.float32)
        hit = ids >= 0
        evecs[hit] = emb.matrix[ids[hit]]
        norms = np.linalg.norm(cmat, axis=1)
        dots = np.einsum("ij,ij->i", evecs, cmat)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(norms > 0, dots / norms, 0.0)
        out = np.where(hit, out, 0.0)
        return pd.Series(out.astype(np.float64))

    return pairs.withColumn(out_col, _score(F.col(entity_key_col), F.col(centroid_col)))


def _ranges(starts: np.ndarray, stops: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated np.arange(starts[i], stops[i]) + the owning row index."""
    lens = np.maximum(stops - starts, 0)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    rows = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
    offs = np.cumsum(lens) - lens
    flat = np.arange(total, dtype=np.int64) - np.repeat(offs, lens) + np.repeat(
        starts, lens
    )
    return flat, rows


def span_context_scores(
    df: DataFrame,
    bc_emb,
    window: int = 2,
    entity_key_col: str = "entity_key",
    toks_col: str = "toks",
    start_col: str = "start",
    length_col: str = "length",
    out_col: str = "context_score",
    skip_col: str | None = None,
    scorer: str = "centroid",
    bc_entity_emb=None,
    use_bigrams: bool = False,
) -> DataFrame:
    """Localized context score: centroid of the tokens within ``window``
    positions of the span (span tokens excluded), dotted with the entity
    vector and normalized by the centroid norm.

    This is the mention-local analogue of FEL's query context
    (`view/EntityContext.java:31-40` — FEL's whole "query" is the window);
    per-turn multi-mention transcripts need the locality so one mention's
    topic words don't drown the other's.

    ``skip_col``: optional int column; rows with value <= 1 short-circuit to
    0.0 inside the UDF (nothing to disambiguate for a single-candidate
    alias) — dynamic pruning without splitting the plan into two branches
    (a plan split would recompute the whole upstream subtree per branch).

    ``scorer`` selects the reference's scorer family (all Arrow-batched,
    loop-free):
    - "centroid"  (`CentroidEntityScorer.java:30-55`): <entity, centroid of
      window tokens>/||centroid||, via prefix sums.
    - "lr"        (`it/cnr/isti/hpc/LREntityScorer.java:28-48`): the learned
      LR scorer -sum_w log(1+exp(bias + <w, e>)); entity vectors (from
      ``bc_entity_emb``, e.g. train_entity_embeddings output) are d+1 wide,
      last dim = bias.
    - "custom_lr" (`w2v/CustomLREntityScorer.java:33-61`): d-wide entity
      vectors, no bias, negated dot — FEL's default contextual path
      (`w2v/LREntityContext.java:26`).
    ``bc_entity_emb``: broadcast EmbeddingMatrix for entity keys (defaults
    to ``bc_emb``, the reference's single-file constructor).

    ``use_bigrams`` (M8): expand the window context with ``w_{i-1}_w_i``
    pseudo-words over consecutive window tokens, exactly like
    `view/EntityContext.setContextWords` (:31-40) — bigrams that miss the
    vocabulary contribute nothing. The span gap counts as adjacency (the
    reference builds the filtered word list first, so words flanking an
    excluded segment become neighbors).
    """
    if scorer not in ("centroid", "lr", "custom_lr"):
        raise ValueError(f"unknown scorer {scorer!r}")
    if bc_entity_emb is None:
        bc_entity_emb = bc_emb
    dim = bc_emb.value.matrix.shape[1]

    @F.pandas_udf("double")
    def _score(
        keys: pd.Series,
        toks: pd.Series,
        starts: pd.Series,
        lengths: pd.Series,
        skips: pd.Series,
    ) -> pd.Series:
        # Fully batch-vectorized (this is the ER pipeline's hottest stage):
        # 1. one hash-index id-map over the batch's flattened tokens,
        # 2. window centroids via prefix sums (sum[lo:hi] minus the span),
        # 3. one einsum for every row's <entity, centroid> dot.
        # No per-row or per-token Python.
        emb = bc_emb.value
        eemb = bc_entity_emb.value
        n = len(keys)
        out = np.zeros(n, dtype=np.float64)
        if n == 0:
            return pd.Series(out)
        sk = skips.to_numpy(dtype=np.float64, na_value=np.inf)
        ent_ids = eemb.ids_for(keys.to_numpy(dtype=object, na_value=None))
        lens = np.fromiter(
            ((len(t) if t is not None else 0) for t in toks),
            dtype=np.int64,
            count=n,
        )
        active = (sk > 1) & (ent_ids >= 0) & (lens > 0)
        idx = np.flatnonzero(active)
        if len(idx) == 0:
            return pd.Series(out)

        flat = np.concatenate([np.asarray(toks.iat[i]) for i in idx])
        tok_ids = emb.ids_for(flat)

        rl = lens[idx]
        base = np.zeros(len(idx), dtype=np.int64)
        np.cumsum(rl[:-1], out=base[1:])
        s0 = np.clip(starts.to_numpy(dtype=np.int64, na_value=0)[idx] - 1, 0, rl)
        se = np.clip(s0 + lengths.to_numpy(dtype=np.int64, na_value=0)[idx], s0, rl)
        lo = np.maximum(0, s0 - window)
        hi = np.minimum(rl, se + window)

        if scorer == "centroid" and not use_bigrams:
            vecs = emb.matrix[np.clip(tok_ids, 0, None)]
            vecs[tok_ids < 0] = 0.0
            # float64 prefix sums: the windowed difference P[hi]-P[lo] must
            # not lose the small window inside a long running total
            pref = np.zeros((len(flat) + 1, dim), dtype=np.float64)
            np.cumsum(vecs, axis=0, out=pref[1:])
            # centroid = sum[lo:hi) - sum[s0:se)  (window minus the span)
            cents = (
                pref[base + hi]
                - pref[base + lo]
                - (pref[base + se] - pref[base + s0])
            )
            norms = np.linalg.norm(cents, axis=1)
            evecs = emb.matrix[ent_ids[idx]].astype(np.float64)
            dots = np.einsum("ij,ij->i", evecs, cents)
            with np.errstate(divide="ignore", invalid="ignore"):
                out[idx] = np.where(norms > 0, dots / norms, 0.0)
            return pd.Series(out)

        # gather path (LR scorers / bigram mode): materialize the window
        # token list per row in logical order — [lo,s0) ++ [se,hi) — via
        # vectorized range construction (no per-row Python)
        wl = s0 - lo
        wtot = wl + (hi - se)
        p, rows = _ranges(np.zeros_like(wtot), wtot)
        actual = np.where(
            p < wl[rows],
            base[rows] + lo[rows] + p,
            base[rows] + se[rows] + (p - wl[rows]),
        )
        ctx_ids = tok_ids[actual]
        ctx_rows = rows
        if use_bigrams:
            # w_{i-1}_w_i pseudo-words over logically adjacent window tokens
            # (EntityContext.setContextWords, view/EntityContext.java:31-40)
            adj = rows[1:] == rows[:-1]
            if adj.any():
                wtoks = flat[actual]
                bg = (
                    pd.Series(wtoks[:-1][adj]).astype(str)
                    + "_"
                    + pd.Series(wtoks[1:][adj]).astype(str)
                )
                bg_ids = emb.ids_for(bg.to_numpy(dtype=object))
                ctx_ids = np.concatenate([ctx_ids, bg_ids])
                ctx_rows = np.concatenate([rows, rows[:-1][adj]])

        ok = ctx_ids >= 0
        wv = emb.matrix[ctx_ids[ok]].astype(np.float64)
        wrows = ctx_rows[ok]
        ev = eemb.matrix[ent_ids[idx]].astype(np.float64)
        if scorer == "centroid":
            cents = np.zeros((len(idx), dim), dtype=np.float64)
            np.add.at(cents, wrows, wv)
            norms = np.linalg.norm(cents, axis=1)
            dots = np.einsum("ij,ij->i", ev, cents)
            with np.errstate(divide="ignore", invalid="ignore"):
                out[idx] = np.where(norms > 0, dots / norms, 0.0)
        else:
            from fel_spark.operators.embeddings import lr_score_batch

            out[idx] = lr_score_batch(
                wv, wrows, ev, len(idx), custom=(scorer == "custom_lr")
            )
        return pd.Series(out)

    skip = F.col(skip_col) if skip_col else F.lit(2)
    return df.withColumn(
        out_col,
        _score(
            F.col(entity_key_col),
            F.col(toks_col),
            F.col(start_col),
            F.col(length_col),
            skip.cast("int"),
        ),
    )


def entity_entity_cosine(
    pairs: DataFrame,
    bc_emb,
    key_a: str,
    key_b: str,
    out_col: str = "entity_cosine",
) -> DataFrame:
    """Cosine between two entities' vectors (0 when either is OOV) —
    the pairwise-match analogue of `CompressedSingleFileEntitySimilarityUtil
    .entity2EntitySimilarity` (`:40-47`)."""
    dim = bc_emb.value.matrix.shape[1]

    @F.pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        emb = bc_emb.value
        ia = np.array([emb.vocab.get(k, -1) for k in a], dtype=np.int64)
        ib = np.array([emb.vocab.get(k, -1) for k in b], dtype=np.int64)
        va = np.zeros((len(a), dim), dtype=np.float32)
        vb = np.zeros((len(b), dim), dtype=np.float32)
        va[ia >= 0] = emb.matrix[ia[ia >= 0]]
        vb[ib >= 0] = emb.matrix[ib[ib >= 0]]
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        dots = np.einsum("ij,ij->i", va, vb)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where((na > 0) & (nb > 0), dots / (na * nb), 0.0)
        return pd.Series(out.astype(np.float64))

    return pairs.withColumn(out_col, _cos(F.col(key_a), F.col(key_b)))


def entity_phrase_similarity(
    pairs: DataFrame,
    bc_emb,
    entity_key_col: str = "entity_key",
    phrase_col: str = "phrase",
    out_col: str = "entity_phrase_sim",
) -> DataFrame:
    """C4: mean cosine between the entity vector and every vocab-hit among
    the phrase's unigrams AND adjacent "_"-joined bigrams
    (`w2v/CompressedSingleFileEntitySimilarityUtil.entity2WordSimilarity`,
    :57-79). 0 when the entity is OOV or no word hits.

    Batched: per Arrow batch the phrase tokens+bigrams flatten to one
    id-map + gather; cosines via one einsum; per-row mean via bincount.
    """
    dim = bc_emb.value.matrix.shape[1]

    @F.pandas_udf("double")
    def _sim(keys: pd.Series, phrases: pd.Series) -> pd.Series:
        emb = bc_emb.value
        n = len(keys)
        out = np.zeros(n, dtype=np.float64)
        if n == 0:
            return pd.Series(out)
        ent_ids = emb.ids_for(keys.to_numpy(dtype=object, na_value=None))
        # vectorized token + "_"-bigram extraction: split -> explode; bigram
        # where consecutive exploded tokens share a row (no per-row Python)
        ps = phrases.reset_index(drop=True)
        ps = ps.where(pd.Series(ent_ids >= 0, index=ps.index), None)
        ex = ps.str.split().explode().dropna()
        rid0 = ex.index.to_numpy(np.int64)
        uni = ex.to_numpy(dtype=object)
        adj = np.nonzero(rid0[1:] == rid0[:-1])[0] + 1
        big = uni[adj - 1] + "_" + uni[adj] if len(adj) else uni[:0]
        words = np.concatenate([uni, big])
        rows = np.concatenate([rid0, rid0[adj]])
        if not len(words):
            return pd.Series(out)
        wid = emb.ids_for(words)
        ok = wid >= 0
        if not ok.any():
            return pd.Series(out)
        rid = rows[ok]
        wv = emb.matrix[wid[ok]].astype(np.float64)
        ev = emb.matrix[np.clip(ent_ids, 0, None)].astype(np.float64)
        wn = np.linalg.norm(wv, axis=1)
        en = np.linalg.norm(ev, axis=1)[rid]
        dots = np.einsum("ij,ij->i", wv, ev[rid])
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where((wn > 0) & (en > 0), dots / (wn * en), 0.0)
        sums = np.bincount(rid, weights=cos, minlength=n)
        cnts = np.bincount(rid, minlength=n)
        nz = cnts > 0
        out[nz] = sums[nz] / cnts[nz]
        return pd.Series(out)

    return pairs.withColumn(out_col, _sim(F.col(entity_key_col), F.col(phrase_col)))


def entity_key_expr(name_col: str) -> F.Column:
    """Entity embedding key: '_wiki_' + name with spaces -> underscores
    (`CoherentEntityLinker.java:322-324` key convention)."""
    return F.concat(F.lit("_wiki_"), F.regexp_replace(F.col(name_col), " ", "_"))
