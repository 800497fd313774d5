"""One-to-one assignment matching and star clustering over scored pairs.

After blocking + pairwise scoring, a record-linkage pipeline must decide
WHICH pairs become links. Transitive connected components (the
`cluster.connected_components` path) over-merge through chains; the two
classic alternatives are

* **one-to-one assignment** for A-vs-B linkage (each A record links to at
  most one B record and vice versa) — the decision rule of the original
  Fellegi-Sunter census application, classically solved greedily by
  descending score (Jaro 1989 used LP assignment; production systems use
  the greedy approximation, cf. Christen 2012 ch.6.9), and
* **star clustering** for dedup graphs (Aslam, Pelekhov & Rus, "The star
  clustering algorithm", J. Graph Algorithms Appl. 2004; evaluated for
  duplicate detection by Hassanzadeh et al., VLDB 2009), which picks
  high-degree centers and attaches neighbors, avoiding the long
  chain-merges CC is prone to.

Both are sequential scan algorithms in their textbook form; this module
implements their deterministic parallel counterparts:

* ``one_to_one_greedy`` runs rounds of **locally-dominant edge matching**
  (Preis 1999; Manne & Bisseling 2007): an edge is taken when it is the
  best remaining edge at BOTH endpoints under a total edge order
  (score DESC, id_a ASC, id_b ASC). Run to convergence this produces
  EXACTLY the sequential greedy-by-score matching — the globally best
  remaining edge is always locally dominant, and removing matched
  vertices commutes with the order — which `tests/test_matching.py`
  proves by fuzz against a plain-Python sequential greedy. Each round is
  two hash-partitioned window ranks + two anti joins: fully distributed,
  no driver-side edge list.
* ``star_clusters`` is the one-shot parallel star variant: centers are
  vertices not dominated by any neighbor under the total order
  (degree DESC, id ASC) — an independent set, so no two centers touch —
  and every other vertex attaches to its best adjacent center, or to
  itself when no center is adjacent. One symmetrize + one aggregation +
  one window: no iteration at all.
* ``pivot_clusters`` is deterministic parallel-pivot correlation
  clustering (Ailon, Charikar & Newman's KwikCluster, JACM 2008, in the
  parallel rounds form of Chierichetti, Dalvi & Kumar, KDD 2014): the
  random permutation is replaced by the engine-neutral hash order
  md5(id), each round's pivots are the vertices that are order-minimal
  in their active neighborhood (an independent set), neighbors of
  pivots join their order-minimal pivot, and everyone clustered leaves
  the graph. Like stars, a cluster has radius 1 around its pivot —
  chains cannot merge — but repeated rounds also resolve the residue
  instead of leaving singletons.

The reference resolves its candidate sets with exactly this
one-winner-per-mention shape (`Datapack` best-alias argmax,
`io/Datapack.java:167-180`); these operators lift that decision layer to
pair graphs.

100 TB shape: everything is windows over (vertex) keys and co-partitioned
joins — no cartesian, no collect. ``one_to_one_greedy`` localCheckpoints
the shrinking edge set per round (bounded ``max_rounds``), the same
lineage discipline as `cluster.connected_components`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _round_matches(
    edges: DataFrame, id_a: str, id_b: str, score_col: str
) -> DataFrame:
    """Edges that are rank-1 at both endpoints under the total edge order
    (score DESC, id_a ASC, id_b ASC). Bipartite semantics: ``id_a`` and
    ``id_b`` are independent key spaces."""
    wa = Window.partitionBy(id_a).orderBy(
        F.col(score_col).desc(), F.col(id_a).asc(), F.col(id_b).asc()
    )
    wb = Window.partitionBy(id_b).orderBy(
        F.col(score_col).desc(), F.col(id_a).asc(), F.col(id_b).asc()
    )
    return (
        edges.withColumn("_ra", F.row_number().over(wa))
        .withColumn("_rb", F.row_number().over(wb))
        .filter((F.col("_ra") == 1) & (F.col("_rb") == 1))
        .drop("_ra", "_rb")
    )


def mutual_best_matches(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str = "score",
) -> DataFrame:
    """Symmetric best match over a bipartite scored pair set: keep (a, b)
    iff b is a's best candidate AND a is b's best candidate, under the
    deterministic total order (score DESC, id_a ASC, id_b ASC). The
    classic high-precision decision rule of deterministic record linkage
    (one window rank per side; one shot, no iteration).

    Output: the surviving subset of ``pairs`` (same columns). A record
    appears in at most one match by construction.
    """
    return _round_matches(pairs, id_a, id_b, score_col)


def one_to_one_greedy(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str = "score",
    max_rounds: int = 4,
    checkpoint: bool = True,
) -> DataFrame:
    """Greedy one-to-one bipartite assignment by descending score, as
    ``max_rounds`` rounds of locally-dominant edge matching (Preis 1999).
    Round k takes every edge that is rank-1 at both endpoints among the
    edges still alive, then drops all edges touching a matched record.
    Run to convergence this IS the sequential greedy matching under the
    total edge order (score DESC, id_a ASC, id_b ASC); with a fixed
    ``max_rounds`` it is a deterministic prefix of it (each round at
    least halves... strictly: matches at least the globally best
    remaining edge, and in practice converges in a handful of rounds —
    callers needing the exact greedy fixpoint pass a generous bound and
    check the returned ``round`` column's max).

    Output: matched pairs with an extra ``round`` column (1-based round
    the edge was taken in). Each id_a / id_b value appears at most once.

    Scale: per round two window ranks + two anti joins, all partitioned
    by the vertex keys; the edge set only shrinks. ``checkpoint`` cuts
    lineage per round (disable only in tests).
    """
    out: DataFrame | None = None
    edges = pairs
    for rnd in range(1, max_rounds + 1):
        matched = _round_matches(edges, id_a, id_b, score_col).withColumn(
            "round", F.lit(rnd)
        )
        out = matched if out is None else out.unionByName(matched)
        if rnd == max_rounds:
            break
        ma = matched.select(F.col(id_a)).distinct()
        mb = matched.select(F.col(id_b)).distinct()
        edges = edges.join(ma, id_a, "left_anti").join(mb, id_b, "left_anti")
        if checkpoint:
            edges = edges.localCheckpoint(eager=True)
            # stop early when nothing is left to match: one cheap count
            # on the just-materialized checkpoint, not an extra action
            if edges.isEmpty():
                break
    assert out is not None
    return out


def _sym_nbr_centers(
    pairs: DataFrame, id_a: str, id_b: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared star/merge-center machinery: symmetrize the pair set, land
    both endpoint degrees on every directed neighbor row, and compute the
    undominated centers under the total order (degree DESC, id ASC).
    Dominance is total on each edge, so centers form an independent set.
    Returns (sym(v, w), nbr(v, w, deg, deg_w), centers(v, is_center))."""
    sym = pairs.select(
        F.col(id_a).alias("v"), F.col(id_b).alias("w")
    ).unionByName(pairs.select(F.col(id_b).alias("v"), F.col(id_a).alias("w")))
    deg = sym.groupBy("v").agg(F.count("*").alias("deg"))
    nbr = sym.join(deg, "v").join(
        deg.select(F.col("v").alias("w"), F.col("deg").alias("deg_w")),
        "w",
    )
    # w dominates v under (deg DESC, id ASC)
    dominated = F.when(
        (F.col("deg_w") > F.col("deg"))
        | ((F.col("deg_w") == F.col("deg")) & (F.col("w") < F.col("v"))),
        F.lit(1),
    ).otherwise(F.lit(0))
    centers = (
        nbr.withColumn("_dom", dominated)
        .groupBy("v")
        .agg(F.max("_dom").alias("_any_dom"))
        .filter(F.col("_any_dom") == 0)
        .select("v", F.lit(1).alias("is_center"))
    )
    return sym, nbr, centers


def star_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """One-shot parallel star clustering of an undirected dedup graph
    (same id namespace on both pair columns). Centers are vertices not
    dominated by any neighbor under the total order (degree DESC,
    id ASC) — dominance is total on each edge, so centers form an
    independent set. Every vertex is then assigned:

    * a center  -> itself,
    * a vertex with >=1 adjacent center -> the adjacent center with the
      highest degree (tie: smaller id),
    * otherwise -> itself (singleton star; the sequential algorithm
      would promote it in a later scan — the one-shot variant keeps it
      separate, trading recall for zero iteration, cf. Aslam et al.
      2004 sec. 4 on the parallel/online variants).

    Output: one row per distinct vertex — (``id``, ``cluster_id``,
    ``is_center``). Unlike transitive CC, two records end up together
    ONLY if at least one of them is directly linked to the shared
    center: chain-merges cannot propagate past a star.

    Scale: symmetrize (map), degree hash-agg, one co-partitioned join to
    land degrees on neighbors, one window argmax. No iteration.
    """
    sym, nbr, centers = _sym_nbr_centers(pairs, id_a, id_b)
    # each vertex's best adjacent center (deg DESC, id ASC)
    adj_center = nbr.join(
        centers.select(F.col("v").alias("w")), "w"
    ).select("v", F.col("w").alias("c"), F.col("deg_w").alias("c_deg"))
    wv = Window.partitionBy("v").orderBy(
        F.col("c_deg").desc(), F.col("c").asc()
    )
    best_center = (
        adj_center.withColumn("_rn", F.row_number().over(wv))
        .filter(F.col("_rn") == 1)
        .select("v", "c")
    )
    verts = sym.select("v").distinct()
    return (
        verts.join(centers, "v", "left")
        .join(best_center, "v", "left")
        .select(
            F.col("v").alias("id"),
            F.when(F.col("is_center") == 1, F.col("v"))
            .otherwise(F.coalesce("c", "v"))
            .alias("cluster_id"),
            F.coalesce("is_center", F.lit(0)).cast("int").alias("is_center"),
        )
    )


def merge_center_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Deterministic parallel MERGE-CENTER clustering (Hassanzadeh,
    Chiang, Lee & Miller, "Framework for evaluating clustering algorithms
    in duplicate detection", VLDB 2009 — their MC variant of Center
    clustering): the middle ground between one-shot stars (radius 1,
    overlapping stars stay split) and transitive CC (merges arbitrary
    chains). Centers are EXACTLY :func:`star_clusters`' centers
    (undominated under degree DESC, id ASC — shared helper, so the two
    decision layers are comparable on the same graph). Where the
    sequential MC scan merges two clusters when a record is similar to
    both their centers, the parallel recast takes the connected
    components of the subgraph of edges INCIDENT TO AT LEAST ONE CENTER:
    a merge conducts only center -> shared member -> center, so
    center-free chain segments never conduct — chaining is bounded by
    center adjacency, not raw path length (path graph test:
    `tests/test_matching.py::test_merge_center_between_star_and_cc`).

    Output: one row per distinct vertex — (``id``, ``cluster_id``,
    ``is_center``) with ``cluster_id`` = min vertex id reachable in the
    kept subgraph (vertices with no center-incident edge stay
    singletons). Star clusters are always a refinement of merge-center
    clusters, which are a refinement of CC components.

    Scale: the star center machinery (symmetrize + degree agg +
    domination agg), one semi-join keeping center-incident edges —
    centers are independent, so each kept edge survives exactly once in
    its center->member direction — then `cluster.connected_components`
    (gated NumPy fast path vs checkpointed pointer-jumping) over the
    REDUCED graph, never the full pair set.
    """
    from fel_spark.operators.cluster import connected_components

    sym, nbr, centers = _sym_nbr_centers(pairs, id_a, id_b)
    kept = (
        nbr.join(centers.select("v"), "v", "left_semi")
        .select(F.col("v").alias("src"), F.col("w").alias("dst"))
    )
    verts = sym.select("v").distinct()
    comp = connected_components(
        kept,
        vertices=verts.select(F.col("v").alias("id")),
        max_iterations=max_iterations,
    )
    return (
        comp.join(centers.select(F.col("v").alias("id"), "is_center"), "id", "left")
        .select(
            "id",
            F.col("component").alias("cluster_id"),
            F.coalesce("is_center", F.lit(0)).cast("int").alias("is_center"),
        )
    )


def canopy_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str = "score",
    t_loose: int = 0,
    t_tight: int = 0,
    max_rounds: int = 4,
    checkpoint: bool = True,
) -> DataFrame:
    """Deterministic parallel canopy clustering (McCallum, Nigam & Ungar,
    KDD 2000): OVERLAPPING coarse clusters from a cheap similarity, the
    classic pre-blocking step for expensive pairwise ER. The sequential
    algorithm picks an arbitrary remaining point as a canopy center,
    sweeps in everything within the LOOSE threshold (membership — a
    point may join many canopies), and removes from future-center
    candidacy everything within the TIGHT threshold. Here the arbitrary
    pick becomes rounds under the engine-neutral md5(id) order (the
    :func:`pivot_clusters` construction): round k's centers are the
    still-candidate points order-minimal among their still-candidate
    TIGHT-neighbors (an independent set in the tight graph — a PREFIX of
    the sequential md5-order sweep: every round-k center is a point that
    sweep would also pick, though some of its later picks wait for a
    later round), every point loose-adjacent to a round-k center joins
    that canopy, and centers plus their tight neighbors leave candidacy.

    ``pairs`` is a scored undirected pair set (same id namespace);
    ``score_col`` is the cheap similarity in integer units,
    ``t_loose`` / ``t_tight`` its two thresholds (>=, with
    ``t_tight >= t_loose`` — tight pairs are a subset of loose pairs).
    After ``max_rounds``, still-candidate points become their own
    singleton canopies with ``round`` 0 (bounded-prefix convention).
    Output: (``id``, ``canopy_id``, ``round``) — one row per MEMBERSHIP
    (a point may carry several), centers members of their own canopy;
    every input vertex appears at least once (a non-candidate point
    never swept into any later canopy keeps its memberships from the
    rounds that took it; a point never loose-adjacent to any center
    exits candidacy only as its own center or a round-0 singleton).

    Scale: per round one hash agg on the tight graph (min candidate
    neighbor order), one semi-join for centers, one co-partitioned join
    of the loose graph onto centers — no windows over the pair set, no
    cartesian; both shrinking graphs are localCheckpoint'd.
    """
    ov = F.md5(F.col("v").cast("string"))
    ow = F.md5(F.col("w").cast("string"))

    def _sym(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(id_a).alias("v"), F.col(id_b).alias("w"))
            .unionByName(
                df.select(F.col(id_b).alias("v"), F.col(id_a).alias("w"))
            )
            .select("v", "w", ov.alias("ov"), ow.alias("ow"))
        )

    loose = _sym(pairs.filter(F.col(score_col) >= F.lit(t_loose)))
    tight = _sym(pairs.filter(F.col(score_col) >= F.lit(t_tight)))
    if checkpoint:
        loose = loose.localCheckpoint(eager=True)
        tight = tight.localCheckpoint(eager=True)
    verts = loose.select("v", "ov").distinct()
    cand = verts
    out: DataFrame | None = None
    for rnd in range(1, max_rounds + 1):
        # tight edges between still-candidate points
        ct = tight.join(cand.select("v"), "v", "left_semi").join(
            cand.select(F.col("v").alias("w")), "w", "left_semi"
        )
        min_nbr = ct.groupBy("v").agg(F.min("ow").alias("min_ow"))
        centers = (
            cand.join(min_nbr, "v", "left")
            .filter(F.col("min_ow").isNull() | (F.col("ov") < F.col("min_ow")))
            .select("v")
        )
        # canopy membership: centers themselves + every loose neighbor
        members = centers.select(
            "v", F.col("v").alias("canopy_id")
        ).unionByName(
            loose.join(
                centers.withColumnRenamed("v", "w"), "w"
            ).select("v", F.col("w").alias("canopy_id"))
        )
        members = members.withColumn("round", F.lit(rnd))
        if checkpoint:
            members = members.localCheckpoint(eager=True)
        out = members if out is None else out.unionByName(members)
        if rnd == max_rounds:
            break
        # candidacy removal: centers + candidate points tight-adjacent
        # to a center
        removed = centers.unionByName(
            ct.join(centers.withColumnRenamed("v", "w"), "w").select("v")
        ).distinct()
        cand = cand.join(removed, "v", "left_anti")
        if checkpoint:
            cand = cand.localCheckpoint(eager=True)
            if cand.isEmpty():
                break
    assert out is not None
    leftovers = cand.join(
        out.select("v").distinct(), "v", "left_anti"
    ).select("v", F.col("v").alias("canopy_id"), F.lit(0).alias("round"))
    return out.unionByName(leftovers).select(
        F.col("v").alias("id"), "canopy_id", "round"
    )


def pivot_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 4,
    checkpoint: bool = True,
) -> DataFrame:
    """Deterministic parallel-pivot correlation clustering of an
    undirected similarity graph (KwikCluster, Ailon-Charikar-Newman JACM
    2008; parallel rounds per Chierichetti-Dalvi-Kumar KDD 2014, with
    the random permutation replaced by the engine-neutral order
    ``md5(cast(id as string))`` — a fixed pseudo-random order both Spark
    and any ANSI replay compute identically, so chains are broken the
    way the randomized analysis expects rather than by adversarial id
    order). Per round, over the still-active subgraph:

    * **pivots** = vertices order-minimal in their closed active
      neighborhood (isolated actives included) — an independent set;
    * every active vertex adjacent to >=1 pivot joins its order-minimal
      pivot (it cannot itself be a pivot: a pivot's neighbors all order
      after it);
    * pivots and assignees leave the graph; surviving edges are those
      with both endpoints still active.

    After ``max_rounds`` rounds, still-active vertices are emitted as
    singletons with ``round`` 0 (the deterministic bounded-prefix
    convention of :func:`one_to_one_greedy`; the KDD'14 analysis gives
    O(log n) rounds w.h.p. under a random order, so a small bound
    resolves practically everything). Output: one row per distinct
    vertex — (``id``, ``cluster_id``, ``round``), where ``round`` is
    the 1-based round the vertex was clustered in. Clusters have radius
    1 around their pivot: like :func:`star_clusters`, chain-merges
    cannot propagate, but later rounds re-cluster the residue instead
    of stranding it in singletons.

    Scale: per round one hash agg (min neighbor order), one
    co-partitioned join onto pivots, one agg argmin — no windows over
    the full edge set, no cartesian, no collect; the active edge set
    only shrinks and is localCheckpoint'd per round.
    """
    ov = F.md5(F.col("v").cast("string"))
    ow = F.md5(F.col("w").cast("string"))
    sym = (
        pairs.select(F.col(id_a).alias("v"), F.col(id_b).alias("w"))
        .unionByName(
            pairs.select(F.col(id_b).alias("v"), F.col(id_a).alias("w"))
        )
        .select("v", "w", ov.alias("ov"), ow.alias("ow"))
    )
    if checkpoint:
        # the pair generator upstream (similarity UDFs, blocked joins) is
        # the expensive part — materialize it ONCE so the per-round
        # branches and the final union never re-derive it
        sym = sym.localCheckpoint(eager=True)
    active_verts = sym.select("v", "ov").distinct()
    active_edges = sym
    out: DataFrame | None = None
    empty_graph = False
    for rnd in range(1, max_rounds + 1):
        if empty_graph:
            break
        min_nbr = active_edges.groupBy("v").agg(F.min("ow").alias("min_ow"))
        av = active_verts.join(min_nbr, "v", "left")
        pivots = av.filter(
            F.col("min_ow").isNull() | (F.col("ov") < F.col("min_ow"))
        ).select("v")
        assigned = (
            active_edges.join(
                pivots.withColumnRenamed("v", "w"), "w"
            )
            .groupBy("v")
            .agg(F.min(F.struct("ow", "w")).alias("_m"))
            .select("v", F.col("_m.w").alias("cluster_id"))
        )
        clustered = pivots.select(
            "v", F.col("v").alias("cluster_id")
        ).unionByName(assigned).withColumn("round", F.lit(rnd))
        if checkpoint:
            # vertex-scale; pins this round's result so the final union
            # and the shrink joins don't replay earlier rounds' lineage
            clustered = clustered.localCheckpoint(eager=True)
        out = clustered if out is None else out.unionByName(clustered)
        if rnd == max_rounds:
            break
        done = clustered.select("v")
        active_verts = active_verts.join(done, "v", "left_anti")
        # keep only edges whose BOTH endpoints stayed active
        keep = active_verts.select("v")
        active_edges = active_edges.join(keep, "v", "left_semi").join(
            keep.withColumnRenamed("v", "w"), "w", "left_semi"
        )
        if checkpoint:
            active_edges = active_edges.localCheckpoint(eager=True)
            if active_edges.isEmpty():
                # remaining actives are all isolated: next round they
                # are ALL pivots (singletons) — emit directly and stop,
                # exactly what the remaining unrolled rounds compute
                singles = active_verts.select(
                    "v", F.col("v").alias("cluster_id")
                ).withColumn("round", F.lit(rnd + 1))
                out = out.unionByName(singles)
                empty_graph = True
    assert out is not None
    leftovers = (
        active_verts.join(out.select("v"), "v", "left_anti")
        .select(
            "v",
            F.col("v").alias("cluster_id"),
            F.lit(0).alias("round"),
        )
    )
    return out.unionByName(leftovers).select(
        F.col("v").alias("id"), "cluster_id", "round"
    )


def label_propagation(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 3,
    include_self: bool = False,
    checkpoint: bool = True,
) -> DataFrame:
    """Deterministic SYNCHRONOUS label propagation (Raghavan, Albert &
    Kumara, "Near linear time algorithm to detect community structures
    in large-scale networks", Phys. Rev. E 2007) — the community-
    detection decision layer for dense match graphs: where stars/pivots
    bound cluster RADIUS, LPA bounds cluster DENSITY — a vertex joins
    the label held by the PLURALITY of its neighbors, so a thin bridge
    between two dense groups cannot merge them (bridge endpoints are
    out-voted by their own side).

    The paper's randomness is removed the same way as in
    :func:`pivot_clusters`: every vertex starts as its own label; each
    round ALL vertices simultaneously adopt the plurality label among
    their neighbors' current labels under the total order
    (count DESC, label ASC). Rounds are bounded (synchronous LPA can
    2-cycle on bipartite structures — the bounded-round prefix is the
    deterministic contract, the same convention as the pivot/canopy
    unrolls); isolated vertices never appear in a symmetrized pair set
    and are the caller's to add as singletons.

    ``include_self`` adds each vertex's own current label to its vote
    (the self-inclusion variant discussed for synchronous schedules,
    cf. Cordasco & Gargano, "Community detection via semi-synchronous
    label propagation", 2010): an isolated EDGE under pure neighbor
    voting swaps labels forever (each endpoint adopts the other's —
    the 2-clique never merges); with the self vote the tie breaks to
    the smaller label and the pair converges in one round. The
    record-linkage plan runs this variant — dedup graphs are full of
    2-cliques.

    Output: one row per vertex — (``id``, ``cluster_id``) after
    ``max_rounds`` (labels are vertex ids).

    Scale: per round ONE co-partitioned join (labels onto directed
    edges), one hash agg (vote counts), one window argmax per vertex —
    no cartesian, no collect; labels localCheckpoint'd per round
    (lineage discipline of `cluster.connected_components`).
    """
    sym = pairs.select(
        F.col(id_a).alias("v"), F.col(id_b).alias("w")
    ).unionByName(pairs.select(F.col(id_b).alias("v"), F.col(id_a).alias("w")))
    verts = (
        pairs.select(F.col(id_a).alias("v"))
        .unionByName(pairs.select(F.col(id_b).alias("v")))
        .distinct()
    )
    if include_self:
        sym = sym.unionByName(verts.select("v", F.col("v").alias("w")))
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)
    labels = verts.withColumn("label", F.col("v"))
    wv = Window.partitionBy("v").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(max_rounds):
        votes = (
            sym.join(
                labels.select(F.col("v").alias("w"), "label"), "w"
            )
            .groupBy("v", "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            votes.withColumn("_rn", F.row_number().over(wv))
            .filter(F.col("_rn") == 1)
            .select("v", "label")
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=True)
    return labels.select(
        F.col("v").alias("id"), F.col("label").alias("cluster_id")
    )


def b_matching_greedy(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str = "score",
    cap_a: int = 1,
    cap_b: int = 2,
    max_rounds: int = 6,
    checkpoint: bool = True,
) -> DataFrame:
    """Greedy CAPACITATED assignment (b-matching): each A record links
    to at most ``cap_a`` B records and each B record accepts at most
    ``cap_b`` A records — the one-to-many linkage shape (deduplicated
    master vs raw mentions, household linkage, one canonical entity
    absorbing several transcripts). Sequential definition: scan edges
    by the shared total order (score DESC, id_a ASC, id_b ASC), take an
    edge when BOTH endpoints still have capacity. Parallelized as
    rounds of locally-dominant-within-capacity selection — the
    b-SUITOR scheme (Khan, Pothen et al., "Efficient approximation
    algorithms for weighted b-matching", SIAM SISC 2016, generalizing
    Preis's dominant-edge argument): a round takes every edge whose
    rank among surviving edges is within the REMAINING capacity at
    both endpoints; per-vertex capacities shrink by the takes, edges
    at saturated vertices drop, repeat. Run to convergence this equals
    the sequential greedy under unique edge order (fuzz-proven in
    `tests/test_matching.py`); ``max_rounds`` is the deterministic
    bounded prefix both engines compute (the one_to_one convention —
    with cap 1 on both sides this IS `one_to_one_greedy`).

    Output: taken edges with a 1-based ``round`` column.

    Scale: per round two capacity joins (vertex-keyed, dictionary- or
    corpus-vertex-scale, co-partitioned), two window ranks on the
    shrinking edge set, one anti join; localCheckpoint per round.
    """
    order = [F.col(score_col).desc(), F.col(id_a).asc(), F.col(id_b).asc()]
    ca = pairs.select(id_a).distinct().withColumn("_ca", F.lit(cap_a))
    cb = pairs.select(id_b).distinct().withColumn("_cb", F.lit(cap_b))
    edges = pairs
    out: DataFrame | None = None
    for rnd in range(1, max_rounds + 1):
        wa = Window.partitionBy(id_a).orderBy(*order)
        wb = Window.partitionBy(id_b).orderBy(*order)
        ranked = (
            edges.withColumn("_ra", F.row_number().over(wa))
            .withColumn("_rb", F.row_number().over(wb))
            .join(ca, id_a)
            .join(cb, id_b)
        )
        take = ranked.filter(
            (F.col("_ra") <= F.col("_ca")) & (F.col("_rb") <= F.col("_cb"))
        ).select(*edges.columns, F.lit(rnd).alias("round"))
        if checkpoint:
            take = take.localCheckpoint(eager=True)
            if take.isEmpty():
                break
        out = take if out is None else out.unionByName(take)
        if rnd == max_rounds:
            break
        na = take.groupBy(id_a).agg(F.count("*").alias("_n"))
        ca = (
            ca.join(na, id_a, "left")
            .select(
                id_a,
                (F.col("_ca") - F.coalesce("_n", F.lit(0))).alias("_ca"),
            )
            .filter(F.col("_ca") > 0)
        )
        nb = take.groupBy(id_b).agg(F.count("*").alias("_n"))
        cb = (
            cb.join(nb, id_b, "left")
            .select(
                id_b,
                (F.col("_cb") - F.coalesce("_n", F.lit(0))).alias("_cb"),
            )
            .filter(F.col("_cb") > 0)
        )
        edges = (
            edges.join(take.select(id_a, id_b), [id_a, id_b], "left_anti")
            .join(ca.select(id_a), id_a, "left_semi")
            .join(cb.select(id_b), id_b, "left_semi")
        )
        if checkpoint:
            edges = edges.localCheckpoint(eager=True)
            ca = ca.localCheckpoint(eager=True)
            cb = cb.localCheckpoint(eager=True)
    if out is None:
        return pairs.withColumn("round", F.lit(0)).limit(0)
    return out


def stable_marriage(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str = "score",
    max_rounds: int = 8,
    checkpoint: bool = True,
) -> DataFrame:
    """Deferred-acceptance stable matching (Gale & Shapley, "College
    admissions and the stability of marriage", Amer. Math. Monthly
    1962) over a scored bipartite candidate set: the STABILITY
    guarantee the greedy layers lack — no unmatched pair (a, b) exists
    where both strictly prefer each other to their assigned partners
    (greedy CAN leave such blocking pairs when a high-score edge is
    consumed transitively). Preferences on both sides are the edge
    scores under the engine-neutral orders (A side: score DESC, id_b
    ASC; B side: score DESC, id_a ASC). By McVitie & Wilson 1971 the
    A-proposing outcome is the UNIQUE A-optimal stable matching
    independent of proposal order, which is what makes the synchronous
    parallel rounds here converge to exactly the sequential algorithm
    (fuzz-proven in `tests/test_matching.py`).

    Round state per A record: ``p`` = proposals made so far; an
    unmatched A proposes to its (p+1)-th preference, every B keeps the
    best proposal among newcomers + its current tentative partner and
    rejects the rest; displaced A's resume from their next preference.
    ``max_rounds`` is the bounded deterministic prefix (the
    one_to_one/b_matching convention); tentative matches after the
    last round are returned.

    Output: (id_a, id_b, score, p) — p the winning proposal's index in
    A's preference list (1 = first choice).

    Scale: the preference ranks are ONE window per side computed once;
    each round is a rank-indexed join (proposal lookup), a per-B
    argmax window over at most |tentative| + |proposers| rows, and
    vertex-keyed bookkeeping joins — the edge set itself is never
    rescanned. State is localCheckpoint'd per round.
    """
    pref = pairs.withColumn(
        "_pr",
        F.row_number().over(
            Window.partitionBy(id_a).orderBy(
                F.col(score_col).desc(), F.col(id_b).asc()
            )
        ),
    )
    if checkpoint:
        pref = pref.localCheckpoint(eager=True)
    degs = pref.groupBy(id_a).agg(F.max("_pr").alias("_deg"))
    state = degs.select(id_a, F.lit(0).alias("_p"), "_deg")
    tent: DataFrame | None = None
    wb = Window.partitionBy(id_b).orderBy(
        F.col(score_col).desc(), F.col(id_a).asc()
    )
    for _ in range(max_rounds):
        if tent is None:
            unmatched = state
        else:
            unmatched = state.join(
                tent.select(id_a), id_a, "left_anti"
            )
        proposers = unmatched.filter(F.col("_p") < F.col("_deg")).select(
            id_a, (F.col("_p") + 1).alias("_p_next")
        )
        if checkpoint:
            proposers = proposers.localCheckpoint(eager=True)
            if proposers.isEmpty():
                break
        props = (
            proposers.select(
                F.col(id_a).alias("_prop_a"), F.col("_p_next")
            )
            .join(
                pref,
                (F.col("_prop_a") == F.col(id_a))
                & (F.col("_p_next") == F.col("_pr")),
            )
            .select(id_a, id_b, score_col, "_pr")
        )
        cand = props if tent is None else tent.unionByName(props)
        keep = (
            cand.withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if checkpoint:
            keep = keep.localCheckpoint(eager=True)
        tent = keep
        # advance p for everyone who proposed this round
        state = (
            state.join(proposers.select(id_a, "_p_next"), id_a, "left")
            .select(
                id_a,
                F.coalesce("_p_next", F.col("_p")).alias("_p"),
                "_deg",
            )
        )
        if checkpoint:
            state = state.localCheckpoint(eager=True)
    if tent is None:
        return pairs.select(
            id_a, id_b, score_col
        ).withColumn("p", F.lit(0)).limit(0)
    return tent.select(
        id_a, id_b, score_col, F.col("_pr").cast("int").alias("p")
    )
