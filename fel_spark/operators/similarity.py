"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — broadcast the (small) query set,
  window top-k per query. The correctness baseline.
- lsh_topk: random-hyperplane-bucketed approximate top-k — the scale path:
  candidates only from shared LSH buckets, exact cosine re-rank inside.
- ivf_topk: IVF-style coarse quantizer — assign every vector to its nearest
  of k centroids (one broadcast join + argmin), probe the query's nearest
  n_probe centroid cells only. Centroids are sampled deterministically.

All distance math is column arithmetic (zip_with/aggregate) or Arrow-batched
NumPy — no row-at-a-time Python.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window as W, functions as F

from fel_spark.functions.sim import cosine_sim


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k: vectors x broadcast(queries) -> cosine -> window top-k.

    queries: (query_id, embedding). Output: (query_id, rank, vec_id, cosine).
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")
    )
    joined = vectors.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        joined.withColumn("cosine", cosine_sim(F.col(vec_col), F.col("_qv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def _hyperplane_bits(vec_col: str, planes: np.ndarray) -> list:
    bits = []
    for p in planes:
        lit_plane = F.array(*[F.lit(float(x)) for x in p])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)))
    return bits


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 12,
    bands: int = 4,
    seed: int = 1234,
) -> DataFrame:
    """Approximate top-k: both sides bucketed by random-hyperplane bands;
    candidates = bucket collisions; exact cosine re-rank. Recall grows with
    ``bands`` (multi-probe), cost shrinks with ``n_planes/bands`` bits."""
    first = vectors.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"]) if first else 0
    planes = np.random.RandomState(seed).randn(n_planes, dim)
    bits_per_band = n_planes // bands

    def band_keys(col: str):
        bits = _hyperplane_bits(col, planes)
        keys = []
        for b in range(bands):
            parts = [
                bits[b * bits_per_band + j].cast("string")
                for j in range(bits_per_band)
            ]
            keys.append(F.concat_ws("", F.lit(f"{b}:"), *parts))
        return F.array(*keys)

    v = vectors.select(id_col, vec_col).withColumn(
        "bk", F.explode(band_keys(vec_col))
    )
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")
    ).withColumn("bk", F.explode(band_keys("_qv")))
    cand = (
        v.join(q, "bk")
        .filter(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([query_id_col, id_col])
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("cosine", cosine_sim(F.col(vec_col), F.col("_qv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 99,
) -> DataFrame:
    """IVF coarse quantization: centroids = deterministic sample of the
    vectors; every vector assigned to its max-cosine centroid (broadcast
    cross + argmin — one pass); queries probe their ``n_probe`` nearest
    cells. Exact cosine re-rank within the probed cells."""
    cents = (
        vectors.select(id_col, vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.lit(10**9)))
        .limit(n_cells)
        .select(
            F.row_number().over(W.orderBy(id_col)).alias("cell_id"),
            F.col(vec_col).alias("_cv"),
        )
    )

    def assign(df: DataFrame, key_cols: list[str], vcol: str, n: int) -> DataFrame:
        j = df.crossJoin(F.broadcast(cents)).withColumn(
            "_csim", cosine_sim(F.col(vcol), F.col("_cv"))
        )
        w = W.partitionBy(*key_cols).orderBy(F.desc("_csim"), F.asc("cell_id"))
        return (
            j.withColumn("_crk", F.row_number().over(w))
            .filter(F.col("_crk") <= n)
            .drop("_cv", "_csim", "_crk")
        )

    v_cells = assign(vectors.select(id_col, vec_col), [id_col], vec_col, 1)
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    q_cells = assign(q, [query_id_col], "_qv", n_probe)
    cand = v_cells.join(q_cells, "cell_id").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("cosine", cosine_sim(F.col(vec_col), F.col("_qv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )
