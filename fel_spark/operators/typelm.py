"""M9: per-type n-gram language model scoring (optional scorer).

Re-expresses `utils/TypeLanguageModel.java:36-157` (model build) and
`view/LMLREntityContext.java:30-83` (Dirichlet-smoothed log-likelihood
scoring, mu=1000, default score -50):

- n-gram extraction (`TypeLanguageModel.getTrigrams`, :116-157): for each
  position i < l-2 emit the unigram, bigram and trigram starting at i, then
  the final bigram + its unigram, then the final unigram (the reference's
  exact, slightly lopsided enumeration — kept verbatim for parity).
- model build: per (type, ngram) frequency, per-type totals, background
  (all-types) ngram frequencies, grand total. The reference accumulates the
  observation frequency once PER NGRAM INSTANCE into the type total and the
  grand total (`TypeLanguageModel.java:93-96`) — mirrored here.
- scoring (`LMLREntityContext.getScoreOf`, :66-83): for each context ngram
  PRESENT in the type's LM, add
      log( (f + mu * bg(w)/totalFreq) / (freq[type] + mu) );
  absent ngrams add nothing; a type with no hits (score 0), an unknown
  type, or a missing LM scores DEFAULT_SCORE (-50).

Spark shape: the model is a dimension artifact (types x ngrams) — built
with two hash aggregations, collected once, and broadcast; scoring runs in
an Arrow-batched pandas UDF against the broadcast dicts.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MU_LM = 1000  # LMLREntityContext.java:35
DEFAULT_SCORE = -50.0  # :36


def ngram_mix(words: list[str]) -> list[str]:
    """getTrigrams (`TypeLanguageModel.java:116-157`), order-faithful."""
    out: list[str] = []
    l = len(words)
    for i in range(l - 2):
        out.append(words[i])
        out.append(words[i] + "_" + words[i + 1])
        out.append(words[i] + "_" + words[i + 1] + "_" + words[i + 2])
    if l > 1:
        out.append(words[l - 2] + "_" + words[l - 1])
        out.append(words[l - 2])
    if l > 0:
        out.append(words[l - 1])
    return out


def ngram_mix_expr(tokens):
    """Column form of :func:`ngram_mix` (pure expressions, codegen).
    element_at is 1-based; the i-loop is guarded because Spark's
    sequence(1, stop) DESCENDS when stop < 1."""
    l = F.size(tokens)
    el = lambda i: F.element_at(tokens, i)  # noqa: E731

    head = F.when(
        l >= 3,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.greatest(l - 2, F.lit(1))),
                lambda i: F.array(
                    el(i),
                    F.concat_ws("_", el(i), el(i + 1)),
                    F.concat_ws("_", el(i), el(i + 1), el(i + 2)),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    tail2 = F.when(
        l > 1,
        F.array(F.concat_ws("_", el(l - 1), el(l)), el(l - 1)),
    ).otherwise(F.array().cast("array<string>"))
    tail1 = F.when(l > 0, F.array(el(l))).otherwise(
        F.array().cast("array<string>")
    )
    return F.concat(head, tail2, tail1)


class TypeLM:
    """Broadcast-sized model: (type, ngram) -> freq, per-type totals,
    background ngram freqs, grand total."""

    def __init__(
        self,
        lm: dict[tuple[str, str], int],
        type_freqs: dict[str, int],
        background: dict[str, int],
        total_freq: int,
    ):
        self.lm = lm
        self.type_freqs = type_freqs
        self.background = background
        self.total_freq = total_freq

    def score(self, type_name: str | None, ngrams: list[str]) -> float:
        """LMLREntityContext.getScoreOf (:66-83)."""
        if type_name is None or type_name not in self.type_freqs:
            return DEFAULT_SCORE
        denom = self.type_freqs[type_name] + MU_LM
        s = 0.0
        for w in ngrams:
            f = self.lm.get((type_name, w))
            if f is not None:
                s += math.log(
                    (f + MU_LM * (self.background.get(w, 0) / self.total_freq))
                    / denom
                )
        return s if s != 0.0 else DEFAULT_SCORE

    def _indexes(self):
        """Lazy vectorized lookup structures (built once per executor after
        broadcast unpickle; excluded from the pickled payload)."""
        idx = getattr(self, "_idx_cache", None)
        if idx is None:
            keys = pd.Index(["\x1f".join(k) for k in self.lm])
            vals = np.fromiter(self.lm.values(), dtype=np.float64, count=len(self.lm))
            bg_idx = pd.Index(list(self.background))
            bg_vals = np.fromiter(
                self.background.values(), dtype=np.float64, count=len(self.background)
            )
            tf_idx = pd.Index(list(self.type_freqs))
            tf_vals = np.fromiter(
                self.type_freqs.values(), dtype=np.float64, count=len(self.type_freqs)
            )
            idx = self._idx_cache = (keys, vals, bg_idx, bg_vals, tf_idx, tf_vals)
        return idx

    def __getstate__(self):
        return {k: v for k, v in self.__dict__.items() if k != "_idx_cache"}

    def score_batch(
        self, types: np.ndarray, grams: np.ndarray, rows: np.ndarray, n: int
    ) -> np.ndarray:
        """Vectorized :meth:`score` over a flattened batch: ``grams[i]``
        belongs to output row ``rows[i]``; ``types`` is per-output-row.
        Same contract: unknown/None type or zero hit-sum -> DEFAULT_SCORE.
        One get_indexer probe against the (type, ngram) index + one bincount
        — no per-row Python (the `ids_for` hash-index pattern)."""
        keys, vals, bg_idx, bg_vals, tf_idx, tf_vals = self._indexes()
        out = np.full(n, DEFAULT_SCORE, dtype=np.float64)
        t_pos = tf_idx.get_indexer(pd.Index(types))  # -1: unknown/None type
        if len(grams) == 0:
            return out
        keep = t_pos[rows] >= 0
        g_rows = rows[keep]
        g_grams = pd.Series(grams[keep], dtype=object)
        if len(g_grams) == 0:
            return out
        t_per_gram = pd.Series(types[g_rows], dtype=object)
        hit = keys.get_indexer(pd.Index(t_per_gram.str.cat(g_grams, sep="\x1f")))
        ok = hit >= 0
        if ok.any():
            f = vals[hit[ok]]
            bg = bg_vals[bg_idx.get_indexer(pd.Index(g_grams[ok]))]
            denom = tf_vals[t_pos[g_rows[ok]]] + MU_LM
            contrib = np.log((f + MU_LM * (bg / self.total_freq)) / denom)
            sums = np.bincount(g_rows[ok], weights=contrib, minlength=n)
            hit_rows = np.zeros(n, dtype=bool)
            hit_rows[g_rows[ok]] = True
            # a row whose contributions sum to exactly 0.0 scores DEFAULT
            # (reference's `s != 0.0` guard) — preserved by the mask below
            nz = hit_rows & (sums != 0.0)
            out[nz] = sums[nz]
        return out


def build_type_lm(
    observations: DataFrame,
    type_col: str = "type_name",
    toks_col: str = "toks",
    freq_col: str = "freq",
) -> TypeLM:
    """Distributed model build: explode the n-gram mix, two hash
    aggregations, collect the (dictionary-scale) result. Mirrors the
    per-ngram-instance accumulation of the reference (see module doc)."""
    ng = observations.select(
        F.col(type_col).alias("_ty"),
        F.col(freq_col).cast("long").alias("_f"),
        F.explode(ngram_mix_expr(F.col(toks_col))).alias("_ng"),
    )
    pair = ng.groupBy("_ty", "_ng").agg(F.sum("_f").alias("f")).collect()
    lm: dict[tuple[str, str], int] = {}
    type_freqs: dict[str, int] = {}
    background: dict[str, int] = {}
    total = 0
    for r in pair:
        lm[(r["_ty"], r["_ng"])] = int(r["f"])
        type_freqs[r["_ty"]] = type_freqs.get(r["_ty"], 0) + int(r["f"])
        background[r["_ng"]] = background.get(r["_ng"], 0) + int(r["f"])
        total += int(r["f"])
    return TypeLM(lm, type_freqs, background, total)


def broadcast_type_lm(spark: SparkSession, model: TypeLM):
    return spark.sparkContext.broadcast(model)


def type_lm_scores(
    df: DataFrame,
    bc_model,
    type_col: str = "type_name",
    toks_col: str = "toks",
    out_col: str = "type_lm_score",
) -> DataFrame:
    """Score each row's (type, context tokens) against the broadcast LM.
    The per-query score cache of the reference (scoreCache, :57) is
    subsumed by Spark-side dedup: score distinct (type, context) upstream
    when contexts repeat.

    Fully vectorized (no per-row Python): scoring SUMS over n-gram
    instances, so only the MULTISET of :func:`ngram_mix` matters — and that
    multiset is exactly {all unigrams} + {all adjacent bigrams} + {all
    trigrams} (the reference's enumeration is an ordering quirk; equality
    asserted in tests). The flat gram list is built with explode + shifted
    object-array concatenation, then scored by one hash-index probe + one
    bincount (:meth:`TypeLM.score_batch`)."""

    @F.pandas_udf("double")
    def _score(types: pd.Series, toks: pd.Series) -> pd.Series:
        model = bc_model.value
        n = len(types)
        ex = toks.reset_index(drop=True).explode().dropna()
        rows = ex.index.to_numpy(np.int64)
        words = ex.to_numpy(dtype=object)
        adj2 = np.nonzero(rows[1:] == rows[:-1])[0] + 1
        adj3 = np.nonzero(rows[2:] == rows[:-2])[0] + 2
        bi = words[adj2 - 1] + "_" + words[adj2] if len(adj2) else words[:0]
        tri = (
            words[adj3 - 2] + "_" + words[adj3 - 1] + "_" + words[adj3]
            if len(adj3)
            else words[:0]
        )
        grams = np.concatenate([words, bi, tri])
        g_rows = np.concatenate([rows, rows[adj2], rows[adj3]])
        out = model.score_batch(
            types.reset_index(drop=True).to_numpy(dtype=object), grams, g_rows, n
        )
        return pd.Series(out, index=types.index)

    return df.withColumn(out_col, _score(F.col(type_col), F.col(toks_col)))
