"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — broadcast the (small) query set,
  window top-k per query. The correctness baseline.
- lsh_topk: random-hyperplane-bucketed approximate top-k — the scale path:
  candidates only from shared LSH buckets, exact cosine re-rank inside.
- kmeans_centroids: Lloyd iterations (C5, `w2v/WordVectorsUtils.java:
  216-331`) with distributed partial sums; only the k x dim centroid
  matrix ever reaches the driver.
- ivf_topk: IVF coarse quantizer — every vector assigned to its nearest
  centroid by ONE Arrow-batched matmul (no crossJoin, no shuffle, no window);
  queries probe their n_probe nearest cells.

All distance math is Arrow-batched NumPy matmuls or native column
arithmetic — no per-row Python, no interpreted per-plane aggregate chains.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

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


def _stack(vs: pd.Series, dim: int) -> np.ndarray:
    """Arrow list column -> (n, dim) float64 matrix (None/ragged -> zeros).

    Fast path: a clean batch (no nulls, uniform length) stacks in one C
    call; the per-row guard loop only runs for ragged/null batches."""
    try:
        out = np.stack(vs.to_numpy())
        if out.ndim == 2 and out.shape[1] == dim:
            return out.astype(np.float64)
    except (ValueError, TypeError):
        pass
    out = np.zeros((len(vs), dim), dtype=np.float64)
    for i, v in enumerate(vs):
        if v is not None and len(v) == dim:
            out[i] = v
    return out


def _band_keys_expr(planes: np.ndarray, bands: int, vec_col):
    """All LSH band keys for a vector in ONE pandas-UDF matmul.

    (n, dim) @ (dim, n_planes) -> sign bits -> per-band packed ints ->
    'band:int' strings. Replaces the former n_planes separate interpreted
    aggregate(zip_with(...)) expression passes per vector.
    """
    n_planes, dim = planes.shape
    bpb = n_planes // bands
    pt = planes.T.astype(np.float64)
    weights = (1 << np.arange(bpb, dtype=np.int64))

    def _f(vs: pd.Series) -> pd.Series:
        V = _stack(vs, dim)
        bits = (V @ pt > 0).astype(np.int64)  # (n, n_planes)
        packed = bits[:, : bands * bpb].reshape(len(vs), bands, bpb) @ weights
        return pd.Series(
            [[f"{b}:{int(packed[i, b])}" for b in range(bands)] for i in range(len(vs))],
            dtype=object,
        )

    return F.pandas_udf(_f, "array<string>")(vec_col)


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
    planes: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k: both sides bucketed by random-hyperplane bands;
    candidates = bucket collisions; exact cosine re-rank. Recall grows with
    ``bands`` (multi-probe), cost shrinks with ``n_planes/bands`` bits.

    ``planes`` pins the hyperplane matrix (replacing the seeded Gaussian
    draw) — the hook that makes the chain SQL-replayable in the driver
    gate (`ann_lsh_recall`), same pattern as `ivf_topk`'s ``centroids``."""
    if planes is None:
        first = vectors.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first else 0
        planes = np.random.RandomState(seed).randn(n_planes, dim)
    else:
        planes = np.asarray(planes, dtype=np.float64)

    v = vectors.select(id_col, vec_col).withColumn(
        "bk", F.explode(_band_keys_expr(planes, bands, F.col(vec_col)))
    )
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")
    ).withColumn("bk", F.explode(_band_keys_expr(planes, bands, F.col("_qv"))))
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


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return np.where(n > 0, m / np.where(n == 0, 1, n), 0.0)


def _cell_assign_expr(cents: np.ndarray, n_probe: int, vec_col):
    """Nearest-centroid cell ids (cosine, top n_probe) via one matmul —
    no crossJoin, no shuffle, no window (the former window-over-crossjoin
    shuffled V x n_cells rows just to take an argmax)."""
    cn = _normalize_rows(cents.astype(np.float64)).T  # (dim, k)
    dim = cents.shape[1]

    def _f(vs: pd.Series) -> pd.Series:
        V = _normalize_rows(_stack(vs, dim))
        sims = V @ cn  # (n, k)
        # top n_probe cells, ties toward the smaller cell id (sort on
        # (-sim, id) via stable argsort over id-ordered columns)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.tolist() for row in order], dtype=object)

    return F.pandas_udf(_f, "array<int>")(vec_col)


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 99,
) -> np.ndarray:
    """C5: k-means (Lloyd) over an embedding column
    (`w2v/WordVectorsUtils.java:216-331`, cosine assignment + mean update).

    Initial centroids are a deterministic hash-ordered sample; each Lloyd
    iteration assigns every vector with one Arrow matmul (no shuffle) and
    reduces per-cell sums in two steps: per-Arrow-batch partial sums
    executor-side (mapInPandas), then the tiny (batches x k) partial table
    is finished on the driver — only k x dim state ever leaves the
    executors, never corpus rows.
    """
    first = vectors.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"]) if first else 0
    init = (
        vectors.select(vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.lit(10**9)))
        .limit(k)
        .collect()
    )
    if not init:
        # empty input: no centroids — callers (semantic_dedup, ivf_topk)
        # check shape[0] instead of hitting zero-width NumPy errors
        return np.zeros((0, max(dim, 1)))
    cents = np.array([r[vec_col] for r in init], dtype=np.float64)
    k_eff = len(cents)

    for _ in range(n_iters):
        cn = _normalize_rows(cents).T

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                V = _stack(pdf[vec_col], dim)
                cells = np.argmax(_normalize_rows(V) @ cn, axis=1)
                rows = []
                for c in np.unique(cells):
                    sel = V[cells == c]
                    rows.append((int(c), sel.sum(axis=0).tolist(), int(len(sel))))
                yield pd.DataFrame(rows, columns=["cell", "vsum", "cnt"])

        parts = vectors.select(vec_col).mapInPandas(
            partial, schema="cell int, vsum array<double>, cnt long"
        ).collect()
        sums = np.zeros((k_eff, dim), dtype=np.float64)
        cnts = np.zeros(k_eff, dtype=np.int64)
        for r in parts:
            sums[r["cell"]] += np.asarray(r["vsum"])
            cnts[r["cell"]] += r["cnt"]
        nonempty = cnts > 0
        cents[nonempty] = sums[nonempty] / cnts[nonempty, None]
    return cents


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
    kmeans_iters: int = 2,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF coarse quantization: Lloyd-refined centroids (C5); every vector
    assigned to its max-cosine cell via one Arrow matmul; queries probe
    their ``n_probe`` nearest cells; exact cosine re-rank inside the
    probed cells.

    ``centroids`` pins the codebook instead of running Lloyd — the hook a
    production run uses to reuse a trained codebook across batches, and
    what makes the chain SQL-replayable in the driver gate
    (`ann_ivf_fixed`)."""
    cents = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else kmeans_centroids(
            vectors, k=n_cells, n_iters=kmeans_iters, id_col=id_col,
            vec_col=vec_col, seed=seed,
        )
    )

    v_cells = vectors.select(id_col, vec_col).withColumn(
        "cell_id", _cell_assign_expr(cents, 1, F.col(vec_col))[0]
    )
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    q_cells = q.withColumn(
        "cell_id", F.explode(_cell_assign_expr(cents, n_probe, F.col("_qv")))
    )
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
