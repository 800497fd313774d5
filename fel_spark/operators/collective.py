"""Collective entity resolution: relational neighbor-match evidence.

Bhattacharya & Getoor, "Collective entity resolution in relational data"
(TKDD 2007): pairwise match decisions should not be independent — if the
NEIGHBORS of two references (co-authors, co-mentions, co-occurring docs)
are themselves resolving to the same entities, that relational evidence
raises the pair's own match likelihood. Classical attribute-only scoring
misses exactly the hard cases (sparse/dirty attributes, common names)
that relational context disambiguates.

This module implements the deterministic, unrollable core of that idea:

- ``neighbor_match_evidence``: given the current matched-pair set M and
  an undirected relation graph E(id, nbr), the evidence for a candidate
  pair (a, b) is the number of (x, y, x', y') tuples with (x, y) in M,
  x' in N(x), y' in N(y) and {x', y'} = {a, b} — i.e. matched pairs
  seen across the two references' neighborhoods, orientation-normalized.
- ``collective_scores``: k rounds of score(t) = min(cap, base +
  boost * evidence(matched(t-1))), matched(t) = score(t) >= threshold.
  Each round's score is recomputed FROM BASE (not compounded), which
  makes every round a pure function of the previous matched set — the
  property that lets an ANSI oracle replay the whole fixpoint prefix as
  a generated CTE unroll (the repo's canopy/pivot convention).

All scores are 4dp fixed-point integers and all evidence values exact
integer counts, so Spark and any SQL replay agree bit-for-bit.

Scale shape per round: the evidence computation is two co-partitioned
equi-joins (matched pairs onto the edge list, once per side) and one
hash aggregate — no cartesian, no windows over the full pair set, no
driver collect. Cost is |M| * avg_degree^2 tuples, the same envelope as
the published message-passing formulation; the candidate-pair set
itself stays bounded by the blocking stage (BlockSplit available when
it must be exhaustive). Rounds are bounded (default 2 — B&G report
most of the lift in the first evidence propagation).

The reference resolves mentions one document at a time with a coherence
lattice (`Coherence.java`; our `operators/coherence.py`); this operator
is the cross-document generalization of the same instinct — context
votes on identity — recast for the ER graft.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_BOOST = 500
DEFAULT_THRESHOLD = 8000
DEFAULT_CAP = 10_000


def neighbor_match_evidence(
    matched: DataFrame,
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    candidate_filter=None,
    broadcast_edges: bool = False,
) -> DataFrame:
    """(id_a, id_b, ev) — orientation-normalized counts of matched pairs
    across the two ids' neighborhoods. ``edges`` is (id, nbr) with BOTH
    directions present (undirected contract, caller-enforced); tuple
    multiplicity counts, so a pair supported by two distinct matched
    neighbor pairs scores 2.

    ``candidate_filter`` (a Column over the output ``id_a``/``id_b``) is
    a membership predicate for the CANDIDATE-PAIR universe: evidence for
    a pair outside the blocking can never be consumed by the left join
    in :func:`collective_scores`, so dropping those tuples BEFORE the
    aggregate leaves every consumed count identical while shrinking the
    evidence table by the blocking's selectivity (often enough to
    broadcast it — guide §2.3, shuffle fewer bytes).
    ``broadcast_edges`` broadcasts the relation graph into the two
    neighborhood joins (right whenever the graph is node-scale)."""
    bc = F.broadcast if broadcast_edges else (lambda df: df)
    m = matched.select(id_a, id_b)
    ex = edges.select(F.col("id").alias(id_a), F.col("nbr").alias("_na"))
    ey = edges.select(F.col("id").alias(id_b), F.col("nbr").alias("_nb"))
    cand = (
        m.join(bc(ex), id_a)
        .join(bc(ey), id_b)
        .filter(F.col("_na") != F.col("_nb"))
        .select(
            F.least("_na", "_nb").alias(id_a),
            F.greatest("_na", "_nb").alias(id_b),
        )
    )
    if candidate_filter is not None:
        cand = cand.filter(candidate_filter)
    return cand.groupBy(id_a, id_b).agg(F.count(F.lit(1)).alias("ev"))


def collective_scores(
    pairs: DataFrame,
    edges: DataFrame,
    base_col: str = "base_4dp",
    id_a: str = "id_a",
    id_b: str = "id_b",
    rounds: int = 2,
    boost: int = DEFAULT_BOOST,
    threshold: int = DEFAULT_THRESHOLD,
    cap: int = DEFAULT_CAP,
    candidate_filter=None,
    broadcast_evidence: bool = False,
) -> DataFrame:
    """Iterated relational evidence propagation over a candidate-pair set.

    Appends, per round t = 1..rounds: ``ev_r{t}`` (neighbor-match
    evidence against round t-1's matched set; round 0 matched = base
    >= threshold) and ``score_r{t}_4dp`` = min(cap, base + boost *
    ev_r{t}); plus the final boolean ``matched`` (last round's score >=
    threshold). The input pair orientation must already be normalized
    (id_a < id_b), the same contract every pair operator here shares.

    ``candidate_filter`` restricts evidence tuples to the candidate
    universe before aggregation (see
    :func:`neighbor_match_evidence` — consumed counts are unchanged).
    ``broadcast_evidence=True`` declares the (filtered) evidence tables
    node-pair-scale: each round's left join then broadcasts the evidence
    side, the quadratic pair stream is never shuffled or checkpointed,
    and the relation graph is broadcast into the evidence joins too.
    """
    keys = [id_a, id_b]
    cur = pairs
    score = F.col(base_col)
    for t in range(1, rounds + 1):
        matched = cur.filter(score >= threshold).select(*keys)
        ev = neighbor_match_evidence(
            matched,
            edges,
            id_a,
            id_b,
            candidate_filter=candidate_filter,
            broadcast_edges=broadcast_evidence,
        )
        if broadcast_evidence:
            ev = F.broadcast(ev)
        cur = (
            cur.join(ev, keys, "left")
            .withColumn(f"ev_r{t}", F.coalesce(F.col("ev"), F.lit(0)).cast("long"))
            .drop("ev")
        )
        score = F.least(
            F.lit(cap).cast("long"),
            (F.col(base_col) + F.lit(boost) * F.col(f"ev_r{t}")).cast("long"),
        )
        cur = cur.withColumn(f"score_r{t}_4dp", score)
        score = F.col(f"score_r{t}_4dp")
        if t < rounds and not broadcast_evidence:
            # each round is a pure function of the previous matched set;
            # pin the shrinking lineage so round t+1 doesn't recompute
            # the whole prefix. (With broadcast evidence the prefix is
            # map-side re-enumerable, so re-evaluation is cheaper than
            # materializing the quadratic stream.)
            cur = cur.localCheckpoint(eager=False)
    return cur.withColumn("matched", F.col(f"score_r{rounds}_4dp") >= threshold)
