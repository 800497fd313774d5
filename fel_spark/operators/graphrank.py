"""PageRank entity prior — iterative DataFrame power iteration.

The reference ranks candidate entities with a popularity prior mined
from anchor/click counts (`ranker/ProbabilityRanker.java`, datapack
counts from `mine-datapack.sh`). A link-graph PageRank is the standard
strengthening of that prior (the public Wikipedia-EL literature uses it
as a feature); here it is a from-scratch fixed-iteration power method in
pure DataFrame algebra — the same iterative-DataFrame pattern as the
checkpointed connected-components pass (`operators/cluster.py`), with a
1-row dangling-mass scalar broadcast per iteration.

    pr_0(v)     = 1 / N
    pr_{k+1}(v) = (1-d)/N + d * ( sum_{u->v} pr_k(u)/outdeg(u)
                                  + dangling_mass_k / N )

where dangling_mass_k = sum of pr_k over nodes with no out-edges
(mass is redistributed uniformly — the classic formulation, so sum(pr)
stays 1 at every iteration and the oracle replay is exact algebra).

Every arithmetic op is an IEEE core op (+ * /), so Spark and an ANSI
replay produce bit-near-identical doubles; only the aggregation ORDER
can differ, which moves the result by ~1 ulp per iteration. Callers
that value-check therefore round to 9 dp at the END (`pr_9dp`), never
on intermediates — the engine-neutral-key discipline applied to floats.

Scale: each iteration is ONE shuffle (the contribution aggregate) plus
a dictionary-scale scalar; nodes/outdeg are computed once and persisted.
The ranks DataFrame is eagerly checkpointed EVERY iteration (same
recipe as cluster.py's pointer jumping): each iteration consumes the
previous ranks twice (dangling mass + contributions), so a lazy loop
recomputes a lineage that doubles per iteration — the checkpoint makes
every iteration O(one shuffle) regardless of depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    ``edges`` must be distinct (src, dst) pairs — multi-edges would
    double-count contributions; callers dedupe upstream where the
    semantics call for it. Returns (node, pr) with sum(pr) == 1.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # dictionary-scale action; also materializes
    outdeg = (
        edges.groupBy(F.col(src).alias("node"))
        .agg(F.count("*").alias("outdeg"))
        .persist()
    )

    inv_n = 1.0 / float(n_nodes)
    ranks = nodes.select("node", F.lit(inv_n).alias("pr"))

    for _ in range(iterations):
        withdeg = ranks.join(outdeg, "node", "left")
        # dangling nodes: no out-edges -> their whole mass redistributes
        dangling = (
            withdeg.filter(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            edges.join(
                withdeg.filter(F.col("outdeg").isNotNull()),
                edges[src] == F.col("node"),
            )
            .select(
                F.col(dst).alias("node"),
                (F.col("pr") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) * inv_n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("dm") * F.lit(inv_n)
                    )
                ).alias("pr"),
            )
        )
        ranks = ranks.localCheckpoint(eager=True)

    # the final localCheckpoint cut the lineage, so the cached inputs
    # can be released before returning
    nodes.unpersist()
    outdeg.unpersist()
    return ranks
