"""Quantized Markov clustering (MCL) over weighted match graphs.

MCL (Stijn van Dongen, "Graph clustering by flow simulation", PhD thesis,
Utrecht 2000; Enright, Van Dongen & Ouzounis, NAR 2002 — the TRIBE-MCL
protein-family application is the canonical ER-adjacent use) alternates
two operations on a column-stochastic transition matrix built from edge
weights:

* **expansion** — M <- M·M (random-walk flow spreads along paths), and
* **inflation** — entrywise square + column renormalize (strong flows
  strengthen, weak flows decay), with small-entry **pruning** keeping the
  matrix sparse.

Clusters emerge as the attractor basins of the converged flow. MCL sits
apart from every other decision layer in this package: CC follows
reachability, stars/pivots bound radius, LPA counts votes, correlation
clustering optimizes disagreements — MCL follows WEIGHTED FLOW, so two
dense groups joined by a low-weight bottleneck separate even when vote
counts or reachability would merge them.

Determinism across engines is the same discipline as the rest of the
repo: ALL arithmetic is exact integer micro-units. Column normalization
is ``(p * 1_000_000) div colsum`` (floor division — Spark ``div`` ==
DuckDB ``//`` on non-negative BIGINTs); expansion products of two
normalized entries are <= 1e12 and their column sums stay far below the
int64 range at any realistic fan-out; inflation squares normalized
entries (<= 1e12) before renormalizing. No doubles anywhere, so the
driver oracle replays the rounds bit-exactly.

100 TB shape: expansion is the classic MCL cost — one co-partitioned
self-join of the entry list on the shared index plus a hash aggregate;
pruning (drop entries < ``prune_micro`` right after each inflation)
is what bounds the per-column density, exactly as in van Dongen ch. 11.
Regulated MCL variants (R-MCL, Satuluri & Parthasarathy KDD 2009) bound
it further for power-law graphs; the pruning knob here is the hook where
that would land. Entries are localCheckpoint'd per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["mcl_clusters", "mcl_matrix"]

_SCALE = 1_000_000


def _div_norm(entries: DataFrame, colsums: DataFrame) -> DataFrame:
    """Column-normalize integer entries to micro-units against the given
    per-column sums: q = (p * 1e6) div colsum. Exact integer math (floor
    division). ``colsums`` is (c, _s) — node-scale, broadcast — so the
    entry stream is normalized map-side instead of re-shuffled and
    sorted under a window (guide §2.4)."""
    return (
        entries.join(F.broadcast(colsums), "c")
        .select(
            "r",
            "c",
            F.expr(f"(p * {_SCALE}) div _s").cast("long").alias("p"),
        )
        .filter(F.col("p") > 0)
    )


def _colsums(entries: DataFrame) -> DataFrame:
    return entries.groupBy("c").agg(F.sum("p").alias("_s"))


def _normalize(entries: DataFrame) -> DataFrame:
    """Column-normalize integer entries to micro-units:
    q = (p * 1e6) div colsum. NOTE: references ``entries`` twice (sums +
    join); callers pass a checkpointed/cheap frame."""
    return _div_norm(entries, _colsums(entries))


def mcl_matrix(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    weight_col: str | None = None,
    n_iter: int = 2,
    prune_micro: int = 1_000,
    checkpoint: bool = True,
) -> DataFrame:
    """Run ``n_iter`` quantized MCL iterations (expand -> normalize ->
    inflate(square) -> normalize -> prune) and return the flow matrix as
    (``r``, ``c``, ``p``) entries in micro-units (column-stochastic up
    to floor rounding). ``weight_col`` gives initial edge weights
    (positive integers; default 1 per edge); self-loops of weight
    ``max(weights)`` per column are added per van Dongen's standard
    loop-augmentation before the first normalization."""
    if checkpoint:
        # the input lineage (often an expensive pair/scoring chain) is
        # referenced once per orientation plus again by the loop
        # aggregate; evaluate it exactly once
        pairs = pairs.localCheckpoint(eager=True)
    sym = pairs.select(
        F.col(id_a).alias("r"),
        F.col(id_b).alias("c"),
        (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("p"),
    ).unionByName(
        pairs.select(
            F.col(id_b).alias("r"),
            F.col(id_a).alias("c"),
            (F.col(weight_col) if weight_col else F.lit(1))
            .cast("long")
            .alias("p"),
        )
    )
    loops = (
        sym.groupBy("c")
        .agg(F.max("p").alias("p"))
        .select(F.col("c").alias("r"), "c", "p")
    )
    base = sym.unionByName(loops)
    if checkpoint:
        # the union references the (possibly expensive) pairs lineage
        # several times (both orientations + the loop aggregate); pin it
        # once so normalization's two passes read materialized rows
        base = base.localCheckpoint(eager=True)
    entries = _normalize(base)
    if checkpoint:
        entries = entries.localCheckpoint(eager=True)
    for _ in range(n_iter):
        # expansion: M2[r, c] = sum_k M[r, k] * M[k, c]
        left = entries.select(
            F.col("r").alias("r"), F.col("c").alias("k"), F.col("p").alias("pl")
        )
        right = entries.select(
            F.col("r").alias("k"), F.col("c").alias("c"), F.col("p").alias("pr")
        )
        expanded = (
            left.join(right, "k")
            .groupBy("r", "c")
            .agg(F.sum(F.col("pl") * F.col("pr")).alias("p"))
        )
        # colsum(M2) computed ANALYTICALLY from M — colsum2[c] =
        # sum_k colsum(M)[k] * M[k, c] (exact integer identity) — so the
        # expanded matrix is never re-shuffled just to normalize it: the
        # expansion's (r, c) aggregate is the round's only heavy exchange
        cs2 = (
            entries.join(
                F.broadcast(
                    _colsums(entries).withColumnRenamed("c", "r").withColumnRenamed("_s", "_sk")
                ),
                "r",
            )
            .groupBy("c")
            .agg(F.sum(F.col("_sk") * F.col("p")).alias("_s"))
        )
        q = _div_norm(expanded, cs2)
        if checkpoint:
            # inflation references q twice (its own colsums + the join)
            q = q.localCheckpoint(eager=True)
        # inflation: entrywise square, renormalize, prune
        inflated = q.select("r", "c", (F.col("p") * F.col("p")).alias("p"))
        entries = _normalize(inflated).filter(F.col("p") >= prune_micro)
        if checkpoint:
            entries = entries.localCheckpoint(eager=True)
    return entries


def mcl_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    weight_col: str | None = None,
    n_iter: int = 2,
    prune_micro: int = 1_000,
    checkpoint: bool = True,
) -> DataFrame:
    """MCL attractor assignment after ``n_iter`` bounded iterations:
    every node (column) follows its strongest incoming flow — attractor
    = argmax_r p(r, c) under (p DESC, r ASC). Converged MCL makes this
    the textbook cluster readout (attractor basins partition the
    graph); at a bounded prefix it is the deterministic contract the
    driver oracle replays. Output: (``id``, ``attractor``,
    ``p_micro``) — one row per node; nodes sharing an attractor are one
    cluster."""
    m = mcl_matrix(
        pairs,
        id_a=id_a,
        id_b=id_b,
        weight_col=weight_col,
        n_iter=n_iter,
        prune_micro=prune_micro,
        checkpoint=checkpoint,
    )
    wc = Window.partitionBy("c").orderBy(F.col("p").desc(), F.col("r").asc())
    return (
        m.withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("c").alias("id"),
            F.col("r").alias("attractor"),
            F.col("p").alias("p_micro"),
        )
    )
