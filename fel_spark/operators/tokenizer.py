"""Distributed BPE tokenizer: train on a one-corpus-pass word-frequency
dictionary, apply via broadcast merge ranks in an Arrow-batched UDF.

The 100 TB shape (how SentencePiece/HF BPE trainers actually scale): the
ONLY corpus-scale work is (1) one word-count aggregation (the A9 pattern —
reference analogue `hash/CountNGramsFromQueries.java` counts n-grams with
one pass) and (2) the map-only tokenize; the merge-selection loop runs
driver-side over the DICTIONARY-scale (word, count) table, bounded by
``max_words``. Apply memoizes per DISTINCT word (Zipf: distinct words per
Arrow batch << rows, and a worker-global cache persists across batches),
so the only Python loop is dictionary-scale — the same posture as the
segmentation DP in `operators/mentions.py`.

Semantics are the classic Sennrich et al. 2016 BPE:

* pair counting weights every adjacent symbol position by the word's
  corpus count (overlapping positions both count: "aaa" contributes 2 to
  (a, a));
* each round merges the (count DESC, pair lexicographic ASC) argmax —
  fully deterministic;
* merging is a left-to-right non-overlapping scan ("aaa" + (a,a) ->
  [aa, a]);
* encoding applies the learned merges IN RANK ORDER, each exhaustively.
  For merges learned in that order this is equivalent to the
  lowest-rank-applicable-first priority encode (later merges only create
  new symbols, never new occurrences of an earlier pair) — equivalence is
  fuzz-tested against an independent priority-queue encoder in
  `tests/test_tokenizer.py`.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from fel_spark.functions.text import normalize_tokens

__all__ = [
    "word_counts",
    "train_bpe_merges",
    "bpe_encode_word",
    "tokenize_bpe",
]


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: normalized-token word frequencies (word, cnt)."""
    return (
        df.select(F.explode(normalize_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _scan_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping merge of adjacent (a, b) -> a+b."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe_merges(
    wc: DataFrame | pd.DataFrame,
    num_merges: int,
    max_words: int = 100_000,
    min_pair_count: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn BPE merges from a (word, cnt) table.

    Returns up to ``num_merges`` triples (left, right, pair_count) in rank
    order; stops early when no pair reaches ``min_pair_count``. The input
    is capped to the ``max_words`` most frequent words (ties broken by
    word ASC) so the driver-side loop is bounded regardless of corpus
    size — the corpus-scale work already happened in :func:`word_counts`.
    """
    if isinstance(wc, DataFrame):
        pdf = (
            wc.orderBy(F.col("cnt").desc(), F.col("word"))
            .limit(int(max_words))
            .toPandas()
        )
    else:
        pdf = (
            wc.sort_values(["cnt", "word"], ascending=[False, True])
            .head(int(max_words))
            .reset_index(drop=True)
        )
    vocab: list[tuple[list[str], int]] = [
        (list(w), int(c)) for w, c in zip(pdf["word"], pdf["cnt"]) if len(w) > 0
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(num_merges)):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab:
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (a, b), best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < min_pair_count:
            break
        merges.append((a, b, best))
        vocab = [(_scan_merge(syms, a, b), c) for syms, c in vocab]
    return merges


def _merge_pairs(merges: Iterable[Sequence[str]]) -> list[tuple[str, str]]:
    """Accept (a, b) or (a, b, count) merge rows."""
    return [(m[0], m[1]) for m in merges]


def bpe_encode_word(word: str, merges: Iterable[Sequence[str]]) -> list[str]:
    """Encode one word: apply merges in rank order, each exhaustively."""
    syms = list(word)
    for a, b in _merge_pairs(merges):
        if len(syms) < 2:
            break
        syms = _scan_merge(syms, a, b)
    return syms


def tokenize_bpe(
    df: DataFrame,
    merges: Iterable[Sequence[str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Map-only BPE tokenize: appends ``out_col`` (array<string>) holding
    the concatenated per-word subword tokens in word order.

    The merge table ships as a broadcast; each Arrow batch encodes only
    its DISTINCT words (np.unique + inverse scatter), with a worker-global
    cache reused across batches and tasks. No shuffle, no per-row state —
    the plan stays a single projection over the scan.
    """
    pairs = _merge_pairs(merges)
    bc = df.sparkSession.sparkContext.broadcast(pairs)

    @F.pandas_udf("array<string>")
    def _encode(words: pd.Series) -> pd.Series:
        m = bc.value
        # worker-global cache, persists across batches AND tasks via python
        # worker reuse — so it MUST be keyed by the merge table, not just
        # the word: two tokenize_bpe calls with different merges can land
        # on the same reused worker (regression-tested)
        cache = _encode_cache.setdefault(tuple(m), {})
        # NULL text -> NULL token array upstream: treat as empty doc
        lengths = np.fromiter(
            (0 if w is None else len(w) for w in words),
            dtype=np.int64,
            count=len(words),
        )
        if lengths.sum() == 0:
            return pd.Series([[] for _ in range(len(words))])
        flat = np.concatenate(
            [np.asarray(w, dtype=object) for w in words if w is not None and len(w)]
        )
        uniq, inv = np.unique(flat.astype(str), return_inverse=True)
        toks_per_uniq: list[list[str]] = []
        for w in uniq:
            hit = cache.get(w)
            if hit is None:
                hit = bpe_encode_word(w, m)
                if len(cache) < 1_000_000:
                    cache[w] = hit
            toks_per_uniq.append(hit)
        uniq_toks = np.empty(len(uniq), dtype=object)
        uniq_toks[:] = toks_per_uniq
        row_tokens: list[list[str]] = []
        pos = 0
        for n in lengths:
            if n == 0:
                row_tokens.append([])
                continue
            chunk = uniq_toks[inv[pos : pos + n]]
            row_tokens.append([t for ts in chunk for t in ts])
            pos += n
        return pd.Series(row_tokens)

    return df.withColumn(out_col, _encode(normalize_tokens(text_col)))


_encode_cache: dict[tuple, dict[str, list[str]]] = {}
