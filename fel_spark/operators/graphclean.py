"""Match-graph cleaning: k-core and k-truss peeling over candidate pairs.

A scored ER match graph routinely carries weakly-supported structure —
records attached by a single lucky comparator hit, chains through hub
blocks — that the decision layers (CC / stars / pivots,
`operators/matching.py`) would otherwise propagate into clusters. The two
standard graph-density filters are

* **k-core** (Seidman, "Network structure and minimum degree", Social
  Networks 1983): the maximal subgraph where every VERTEX keeps degree
  >= k. Peeling is the textbook algorithm — repeatedly delete vertices
  of degree < k; the fixpoint is order-independent, so the synchronous
  parallel rounds here compute exactly the sequential core.
* **k-truss** (Cohen, "Trusses: cohesive subgraphs for social network
  analysis", NSA tech report 2008; distributed form in Wang & Cheng,
  VLDB 2012): the maximal subgraph where every EDGE is supported by
  >= k-2 triangles. The edge analogue of the core — one spurious link
  between two true clusters survives a 2-core but has zero triangle
  support and falls out of any 3-truss.

Both are bounded-round synchronous peels: each round recomputes
degree/support on the surviving subgraph and removes everything below
threshold SIMULTANEOUSLY — a deterministic prefix of the (unique)
fixpoint, converged when a round removes nothing. Rounds are exactly
replayable in SQL (the driver oracles unroll them round by round).

Triangle support is counted on the ORIENTED graph (edges directed
low id -> high id): each triangle {a<b<c} is enumerated exactly once as
the wedge (a->b, a->c) closed by b->c — the standard compact-forward
scheme (Latapy 2008). At corpus scale this is two co-partitioned
self-joins of the (already blocked and thresholded) edge list, never a
cartesian; a degree-ordered orientation (heavier endpoint second) would
further bound wedge fan-out under skew, which matters once hub blocks
survive scoring — noted here because the id orientation is what the SQL
replay pins.

100 TB shape: per round one hash agg (degrees / supports) + semi/anti
joins on the shrinking edge set, localCheckpoint'd per round — the same
lineage discipline as `cluster.connected_components`. No collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["k_core", "k_truss", "triangle_support"]


def _sym(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    return pairs.select(
        F.col(id_a).alias("v"), F.col(id_b).alias("w")
    ).unionByName(pairs.select(F.col(id_b).alias("v"), F.col(id_a).alias("w")))


def k_core(
    pairs: DataFrame,
    k: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 4,
    checkpoint: bool = True,
) -> DataFrame:
    """Synchronous k-core peel (Seidman 1983): round r deletes every
    surviving vertex whose degree in the surviving subgraph is < k; the
    fixpoint is the k-core (order-independent, so the parallel rounds
    agree with any sequential peel). Bounded ``max_rounds`` — a
    deterministic prefix; pass a generous bound and check ``peel_round``
    = 0 rows for the true core (a round that removes nothing has
    converged, and the loop stops there).

    Output: one row per input vertex — (``id``, ``peel_round``,
    ``in_core``): peel_round = the 1-based round the vertex fell out
    (0 for survivors), in_core = 1 for survivors.
    """
    sym = _sym(pairs, id_a, id_b)
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)
    all_verts = sym.select("v").distinct()
    if checkpoint:
        all_verts = all_verts.localCheckpoint(eager=True)
    live = sym
    out: DataFrame | None = None
    for rnd in range(1, max_rounds + 1):
        deg = live.groupBy("v").agg(F.count("*").alias("deg"))
        drop = deg.filter(F.col("deg") < k).select("v")
        if checkpoint:
            drop = drop.localCheckpoint(eager=True)
            if drop.isEmpty():
                break
        peeled = drop.withColumn("peel_round", F.lit(rnd))
        out = peeled if out is None else out.unionByName(peeled)
        live = live.join(drop, "v", "left_anti").join(
            drop.withColumnRenamed("v", "w"), "w", "left_anti"
        )
        if checkpoint:
            live = live.localCheckpoint(eager=True)
    # vertices isolated by earlier peels but never below-k themselves
    # cannot exist: losing an edge lowers degree, so they fall out in a
    # later round or survive with deg >= k. Survivors = all - peeled.
    if out is None:
        return all_verts.select(
            F.col("v").alias("id"),
            F.lit(0).alias("peel_round"),
            F.lit(1).alias("in_core"),
        )
    return (
        all_verts.join(out, "v", "left")
        .select(
            F.col("v").alias("id"),
            F.coalesce("peel_round", F.lit(0)).cast("int").alias("peel_round"),
            F.when(F.col("peel_round").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("in_core"),
        )
    )


def triangle_support(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    assume_oriented: bool = False,
    broadcast_edges: bool = False,
) -> DataFrame:
    """Per-edge triangle support on the oriented graph. ``edges`` must be
    one row per undirected edge; orientation (low id first) is applied
    here. Each triangle {a<b<c} is counted once as the wedge
    (a->b, a->c) closed by (b->c), and contributes support to all three
    of its edges. -> (id_a, id_b, support) with id_a < id_b, support 0
    edges included.

    ``assume_oriented=True`` declares the input already oriented
    (id_a < id_b) and distinct, skipping a full re-orientation shuffle —
    the contract k_truss's peel loop maintains between rounds.
    ``broadcast_edges=True`` broadcasts the edge list into the wedge and
    closure joins (guide §3.1): the quadratic wedge stream is then
    generated and closed map-side instead of being shuffled against the
    edge set — right whenever the edge list fits in executor memory."""
    if assume_oriented:
        e = edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    else:
        e = edges.select(
            F.least(id_a, id_b).alias("a"), F.greatest(id_a, id_b).alias("b")
        ).distinct()
    bc = F.broadcast if broadcast_edges else (lambda df: df)
    # wedges at the low vertex: (a->b, a->c) with b < c
    tri = (
        e.alias("x")
        .join(bc(e.alias("y")), F.col("x.a") == F.col("y.a"))
        .filter(F.col("x.b") < F.col("y.b"))
        .select(
            F.col("x.a").alias("ta"),
            F.col("x.b").alias("tb"),
            F.col("y.b").alias("tc"),
        )
        .join(
            bc(e.select(F.col("a").alias("tb"), F.col("b").alias("tc"))),
            ["tb", "tc"],
            "left_semi",
        )
    )
    # each triangle supports its three edges
    per_edge = (
        tri.select(F.col("ta").alias("a"), F.col("tb").alias("b"))
        .unionByName(tri.select(F.col("ta").alias("a"), F.col("tc").alias("b")))
        .unionByName(tri.select(F.col("tb").alias("a"), F.col("tc").alias("b")))
        .groupBy("a", "b")
        .agg(F.count("*").alias("support"))
    )
    return (
        e.join(per_edge, ["a", "b"], "left")
        .select(
            F.col("a").alias(id_a),
            F.col("b").alias(id_b),
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
        )
    )


def k_truss(
    pairs: DataFrame,
    k: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 4,
    checkpoint: bool = True,
    broadcast_edges: bool = False,
) -> DataFrame:
    """Synchronous k-truss peel (Cohen 2008): round r deletes every
    surviving EDGE whose triangle support in the surviving subgraph is
    < k-2; the fixpoint is the k-truss (order-independent). Bounded
    ``max_rounds`` prefix, converged when a round removes nothing.

    Output: one row per input undirected edge (id_a < id_b after
    orientation) — (``id_a``, ``id_b``, ``peel_round``, ``in_truss``):
    peel_round = 1-based removal round (0 for survivors), in_truss = 1
    for survivors. A single spurious inter-cluster link has support 0
    and falls out of any k >= 3 truss in round 1; true dense clusters
    keep their edges.
    """
    need = k - 2
    all_e = pairs.select(
        F.least(id_a, id_b).alias("a"), F.greatest(id_a, id_b).alias("b")
    ).distinct()
    if checkpoint:
        all_e = all_e.localCheckpoint(eager=True)
    if not checkpoint:
        # recompute path: without lineage cuts the decremental update
        # below would reference each round's support frame several times
        # per round and the plan would grow exponentially — re-derive
        # support on the shrinking live graph instead (small-graph /
        # test configuration)
        live = all_e
        out0: DataFrame | None = None
        for rnd in range(1, max_rounds + 1):
            sup0 = triangle_support(
                live, "a", "b", assume_oriented=True,
                broadcast_edges=broadcast_edges,
            )
            drop0 = sup0.filter(F.col("support") < need).select("a", "b")
            peeled0 = drop0.withColumn("peel_round", F.lit(rnd))
            out0 = peeled0 if out0 is None else out0.unionByName(peeled0)
            live = live.join(drop0, ["a", "b"], "left_anti")
        return _truss_assemble(all_e, out0, id_a, id_b)
    # full triangle enumeration ONCE; later rounds maintain support
    # DECREMENTALLY (the classic peeling formulation): every distinct
    # triangle of the current live graph that contains a dropped edge
    # disappears, decrementing each of its SURVIVING edges by exactly 1.
    # sup(live_t) == sup(live_{t-1}) - delta_t restricted to survivors,
    # so the per-round drop sets — and hence peel_round labels — are
    # identical to full recomputation (r6; guide §1.2 "remove passes").
    # Requires checkpointing (each round's support frame is referenced
    # several times; the eager cut also powers the convergence probe).
    sup = triangle_support(
        all_e,
        "a",
        "b",
        assume_oriented=True,
        broadcast_edges=broadcast_edges,
    )
    sup = sup.localCheckpoint(eager=True)
    bc = F.broadcast if broadcast_edges else (lambda df: df)
    out: DataFrame | None = None
    for rnd in range(1, max_rounds + 1):
        drop = sup.filter(F.col("support") < need).select("a", "b")
        drop = drop.localCheckpoint(eager=True)
        if drop.isEmpty():
            break
        peeled = drop.withColumn("peel_round", F.lit(rnd))
        out = peeled if out is None else out.unionByName(peeled)
        # distinct triangles of the CURRENT live graph containing >= 1
        # dropped edge: complete each dropped (a, b) with every z
        # adjacent to a whose (b, z) edge is also live; a triangle with
        # two dropped edges is found from both but kept once (distinct)
        live_e = sup.select("a", "b")
        adj = live_e.select(
            F.col("a").alias("_u"), F.col("b").alias("_z")
        ).unionByName(
            live_e.select(F.col("b").alias("_u"), F.col("a").alias("_z"))
        )
        tri = (
            drop.join(bc(adj), drop["a"] == adj["_u"])
            .filter(F.col("_z") != F.col("b"))
            .join(
                bc(
                    live_e.select(
                        F.col("a").alias("_e1"), F.col("b").alias("_e2")
                    )
                ),
                (F.least("b", "_z") == F.col("_e1"))
                & (F.greatest("b", "_z") == F.col("_e2")),
                "left_semi",
            )
            .select(
                F.array_sort(F.array("a", "b", "_z")).alias("_t")
            )
            .distinct()
            .select(
                F.col("_t")[0].alias("t1"),
                F.col("_t")[1].alias("t2"),
                F.col("_t")[2].alias("t3"),
            )
        )
        delta = (
            tri.select(F.col("t1").alias("a"), F.col("t2").alias("b"))
            .unionByName(tri.select(F.col("t1").alias("a"), F.col("t3").alias("b")))
            .unionByName(tri.select(F.col("t2").alias("a"), F.col("t3").alias("b")))
            .groupBy("a", "b")
            .agg(F.count("*").alias("_d"))
        )
        sup = (
            sup.join(drop, ["a", "b"], "left_anti")
            .join(bc(delta), ["a", "b"], "left")
            .select(
                "a",
                "b",
                (F.col("support") - F.coalesce("_d", F.lit(0)))
                .cast("long")
                .alias("support"),
            )
        )
        sup = sup.localCheckpoint(eager=True)
    return _truss_assemble(all_e, out, id_a, id_b)


def _truss_assemble(
    all_e: DataFrame, out: DataFrame | None, id_a: str, id_b: str
) -> DataFrame:
    if out is None:
        return all_e.select(
            F.col("a").alias(id_a),
            F.col("b").alias(id_b),
            F.lit(0).alias("peel_round"),
            F.lit(1).alias("in_truss"),
        )
    return (
        all_e.join(out, ["a", "b"], "left")
        .select(
            F.col("a").alias(id_a),
            F.col("b").alias(id_b),
            F.coalesce("peel_round", F.lit(0)).cast("int").alias("peel_round"),
            F.when(F.col("peel_round").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("in_truss"),
        )
    )
