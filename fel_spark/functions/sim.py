"""Similarity kernels: token Jaccard, char-bigram Dice, cosine, Jaro-Winkler.

Native column expressions where Spark can express them (JVM-side, codegen);
Jaro-Winkler is an Arrow-batched pandas UDF (NumPy-backed loop over the batch
— never a row-at-a-time Python UDF).

Reference semantics:
- char-bigram Dice  `w2v/CompressedSingleFileEntitySimilarityUtil.java:147-164`
  (2*|P1 ∩ P2| / (|P1|+|P2|), multiset intersection)
- cosine            `w2v/WordVectorsUtils.java:359-370`
- Jaro-Winkler is the north_star's lexical kernel (FEL's analogue is the
  bigram Dice); implementation matches DuckDB's jaro_winkler_similarity
  (boost threshold 0.7, prefix <=4, scaling 0.1) so it is oracle-checkable.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.types import DoubleType


def array_jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard of two string arrays: |a ∩ b| / |a ∪ b| (0 when both empty)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def bigram_dice(a: Column, b: Column) -> Column:
    """Char-bigram Dice over bigram arrays (set semantics on distinct pairs).

    The reference counts multiset overlap; on short mention strings the set
    form is equivalent in the common case and is expressible natively.
    """
    da, db = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(da, db))
    denom = F.size(da) + F.size(db)
    return F.when(denom > 0, 2.0 * inter / denom).otherwise(F.lit(0.0))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine of two array<float|double> columns, pure column arithmetic.

    `zip_with` product + `aggregate` sum stays inside codegen; returns 0.0
    for zero-norm inputs (reference returns 0 for OOV,
    `CompressedSingleFileEntitySimilarityUtil.java:40-47`).
    """
    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: u.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, w: acc + w,
        )

    num = dot(a, b)
    na, nb = F.sqrt(dot(a, a)), F.sqrt(dot(b, b))
    return F.when((na > 0) & (nb > 0), num / (na * nb)).otherwise(F.lit(0.0))


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    if match_dist < 0:
        match_dist = 0
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str) -> float:
    """Standard Jaro-Winkler (boost threshold 0.7, prefix cap 4, p=0.1)."""
    j = _jaro(s1, s2)
    if j > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a == b:
                prefix += 1
            else:
                break
        j += prefix * 0.1 * (1.0 - j)
    return j


@F.pandas_udf(DoubleType())
def jaro_winkler_pudf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler over string pairs."""
    return pd.Series(
        [jaro_winkler(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
    )
