"""Swoosh-style merge-based entity resolution.

Benjelloun, Garcia-Molina et al., "Swoosh: a generic approach to entity
resolution" (VLDB Journal 2009): ER as repeated MATCH + MERGE until
fixpoint. The defining property vs match-based ER (score pairs once,
transitively close) is that MERGING ENABLES NEW MATCHES — the merged
record carries the union of its members' features, and that union may
match a record neither member matched on its own. With an ICAR
match/merge pair (idempotent, commutative, associative, representative)
the fixpoint is unique regardless of processing order, which is what
makes a deterministic data-parallel recast possible at all.

This module uses the canonical ICAR instance:

- feature model: a record is a SET of features (here: distinct
  normalized token n-grams of a document, but any (rid, tok) relation);
- match(r, s):  |F(r) & F(s)| >= min_overlap  — monotone under union,
  so matches only ever grow as merges happen (the ICAR guarantee);
- merge(r, s):  F(r) | F(s), represented by the MIN member id.

Execution is the D-Swoosh-shaped distributed recast, not R-Swoosh's
sequential scan: each ROUND is

1. entity features:   E = distinct (rep, tok) from the current
   assignment (union-merge happens here, for free, as DISTINCT);
2. match:             token-postings self-join on tok, pairs of reps
   sharing >= min_overlap distinct features (a < b) — the postings
   join IS the blocking, no cartesian anywhere;
3. associate:         hash-min one step — every rep adopts
   least(itself, min matched partner), applied simultaneously;
4. remap:             rid -> new rep.

Every round is a pure function of the previous assignment (scores are
exact integer overlap counts, reps are min-ids), so a bounded-round run
is replayable as a generated CTE unroll in ANSI SQL — the repo's
canopy/pivot/collective oracle convention. With ``rounds=None`` the loop
runs to the Swoosh fixpoint (no rep moved), localCheckpointing each
round to cut lineage, one count action per round (the same Amdahl
envelope as `cluster.connected_components`).

Scale shape per round: one distinct-project, one postings equi-join +
hash agg, one tiny rep-level agg, one remap join. Hot features (shared
by thousands of entities) blow up the postings join exactly like hot
blocking keys; ``max_token_df`` drops features with postings above the
cap from the MATCH join only (the standard frequent-feature stop-list —
recall-lossy, so callers get the dropped volume back via
:func:`hot_feature_audit` rather than silently).

Reference analogue: FEL merges alias evidence across sources into one
dictionary entry before linking (`io/Datapack.java`, mine-datapack.sh
count-merge stages); Swoosh is the same union-of-evidence instinct
promoted to the record level, recast for the ER graft.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fel_spark.functions.text import normalize_tokens, token_ngrams

DEFAULT_MAX_ROUNDS = 20


def swoosh_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 2,
) -> DataFrame:
    """(rid, tok) — the distinct token-n-gram feature set per record."""
    toks = normalize_tokens(text_col)
    return (
        docs.select(
            F.col(id_col).alias("rid"),
            F.explode(token_ngrams(toks, ngram_n)).alias("tok"),
        )
        .distinct()
    )


def hot_feature_audit(
    feats: DataFrame, max_token_df: int
) -> DataFrame:
    """(tok, df) for features the match join would drop under
    ``max_token_df`` — the recall audit for the stop-list."""
    return (
        feats.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_token_df)
    )


def _match_pairs(
    ents: DataFrame, min_overlap: int, max_token_df: int | None
) -> DataFrame:
    """(ra, rb) with ra < rb and >= min_overlap shared distinct features."""
    post = ents
    if max_token_df is not None:
        hot = (
            ents.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_token_df)
            .select("tok")
        )
        post = ents.join(F.broadcast(hot), "tok", "left_anti")
    a = post.select(F.col("rep").alias("ra"), "tok")
    b = post.select(F.col("rep").alias("rb"), "tok")
    return (
        a.join(b, "tok")
        .filter(F.col("ra") < F.col("rb"))
        .groupBy("ra", "rb")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_overlap)
        .select("ra", "rb")
    )


def swoosh_merge(
    feats: DataFrame,
    min_overlap: int,
    rounds: int | None = None,
    max_rounds: int = DEFAULT_MAX_ROUNDS,
    max_token_df: int | None = None,
) -> DataFrame:
    """Run match+merge rounds; returns the assignment (rid, entity).

    ``rounds=N`` pins exactly N rounds (the oracle-able form);
    ``rounds=None`` runs to the Swoosh fixpoint (<= max_rounds), with
    ONE count action per round as the convergence probe. BOTH modes
    localCheckpoint the assignment every round: each round references
    the previous assignment three times (entity features, rep set,
    remap), so an uncut lineage grows 3^rounds analysis-time — Catalyst
    hangs around round ~8 without the cut (found the hard way in
    test_fixpoint_equals_pinned_rounds).
    """
    assign = feats.select("rid").distinct().select(
        F.col("rid"), F.col("rid").alias("rep")
    )
    fixed = rounds is not None
    n = rounds if fixed else max_rounds
    for _ in range(n):
        ents = (
            assign.join(feats, "rid").select("rep", "tok").distinct()
        )
        pairs = _match_pairs(ents, min_overlap, max_token_df)
        nbr_min = (
            pairs.select(F.col("ra").alias("rep"), F.col("rb").alias("nb"))
            .unionByName(
                pairs.select(F.col("rb").alias("rep"), F.col("ra").alias("nb"))
            )
            .groupBy("rep")
            .agg(F.min("nb").alias("mn"))
        )
        remap = (
            assign.select("rep")
            .distinct()
            .join(nbr_min, "rep", "left")
            .select(
                "rep",
                F.least(F.col("rep"), F.coalesce(F.col("mn"), F.col("rep"))).alias(
                    "nrep"
                ),
            )
        )
        new_assign = assign.join(remap, "rep").select(
            "rid", F.col("nrep").alias("rep")
        ).localCheckpoint(eager=True)
        if not fixed:
            moved = (
                remap.filter(F.col("nrep") != F.col("rep")).limit(1).count()
            )
            assign = new_assign
            if moved == 0:
                break
        else:
            assign = new_assign
    return assign.select("rid", F.col("rep").alias("entity"))


def entity_profiles(assign: DataFrame, feats: DataFrame) -> DataFrame:
    """(entity, n_members, n_toks) — merged-record sizes per entity."""
    members = assign.groupBy("entity").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    toks = (
        assign.join(feats, "rid")
        .select("entity", "tok")
        .distinct()
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("n_toks"))
    )
    return members.join(toks, "entity")
