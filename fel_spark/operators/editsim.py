"""Edit-distance pair scoring: the classic string-comparator suite.

Record-linkage systems score candidate pairs with a small battery of
string comparators (Winkler 1990; Christen 2012 ch.5): Levenshtein edit
distance, Jaro-Winkler, fixed-width Hamming, and character-set Jaccard.
The reference scores alias candidates with lexical similarity kernels of
exactly this family (`CompressedSingleFileEntitySimilarityUtil.java:147-164`
bigram Dice; the FEL ranker's lexical feature); this module completes the
comparator battery so a blocking stage's candidate pairs can be scored
with the standard measures used by Splink/RecordLinkage-style pipelines.

Engine mapping — every comparator stays JVM-side except Jaro-Winkler:

- Levenshtein: Spark's native ``levenshtein`` (whole-stage codegen);
  DuckDB's native ``levenshtein`` is the oracle — two independent
  engine-native implementations of the same published DP.
- Jaro-Winkler: the Arrow-batched NumPy kernel
  (:func:`fel_spark.functions.sim.jaro_winkler_batch`), already
  fuzz-proven bit-exact against DuckDB's ``jaro_winkler_similarity``.
- Hamming: equal-width keys (caller lpads) compared position-wise with
  a zip_with over single-char splits — pure columns, no UDF.
- Character-set Jaccard: ``array_distinct`` + ``array_intersect`` /
  ``array_union`` over single-char splits — pure columns; DuckDB's
  native ``jaccard`` is the oracle (both are set-based, duplicate chars
  collapse).

Scale shape: map-only over the candidate-pair set the blocking stage
already bounded — zero shuffles added; the only Python is the one
Arrow-batched JW kernel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from fel_spark.functions.sim import jaro_winkler_pudf

MICRO = 1_000_000


def _chars(c: Column) -> Column:
    # split on the empty pattern yields one element per character; Spark
    # appends no trailing empty element for non-empty input (parity with
    # DuckDB's per-character semantics is pinned in tests).
    return F.split(c, "")


def char_jaccard(a: Column, b: Column) -> Column:
    """Set-based character Jaccard — DuckDB ``jaccard`` semantics
    (duplicates collapse; both sides must be non-empty)."""
    da, db = F.array_distinct(_chars(a)), F.array_distinct(_chars(b))
    return F.size(F.array_intersect(da, db)).cast("double") / F.size(
        F.array_union(da, db)
    ).cast("double")


def hamming_fixed(a: Column, b: Column) -> Column:
    """Position-wise mismatch count over equal-length strings — DuckDB
    ``hamming`` semantics (caller guarantees equal width, e.g. via lpad)."""
    return F.aggregate(
        F.zip_with(_chars(a), _chars(b), lambda x, y: (x != y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def edit_distance_scores(
    pairs: DataFrame,
    col_a: str = "s_a",
    col_b: str = "s_b",
    hamming_width: int = 8,
) -> DataFrame:
    """Attach the comparator battery to candidate pairs.

    Emits ``lev`` (exact int), ``ham`` (exact int over lpad-``hamming_width``
    keys), ``jw_micro`` and ``cjacc_micro`` (micro-unit rounded, the repo's
    engine-neutral float convention). Map-only; requires non-empty strings
    on both sides (char-Jaccard is undefined on empty input in both
    engines — filter upstream).
    """
    a, b = F.col(col_a), F.col(col_b)
    fa = F.lpad(a, hamming_width, "0")
    fb = F.lpad(b, hamming_width, "0")
    return (
        pairs.withColumn("lev", F.levenshtein(a, b).cast("long"))
        .withColumn("ham", hamming_fixed(fa, fb))
        .withColumn(
            "jw_micro",
            F.round(jaro_winkler_pudf(a, b) * MICRO).cast("long"),
        )
        .withColumn(
            "cjacc_micro",
            F.round(char_jaccard(a, b) * MICRO).cast("long"),
        )
    )


def monge_elkan(
    pairs: DataFrame,
    tokens_a: str = "toks_a",
    tokens_b: str = "toks_b",
    id_cols: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Monge-Elkan similarity (Monge & Elkan 1996): for token lists A, B,

        ME(A, B) = (1/|A|) * sum_{a in A} max_{b in B} jw(a, b)

    — the standard hybrid comparator for multi-word names (asymmetric by
    definition; callers wanting symmetry take max(ME(A,B), ME(B,A))).

    Shape: explode A-tokens (pair-id keyed), join the B-token array along
    (it rides the exploded rows — no second shuffle), compute the inner
    JW row-wise against each B token via one more explode, then two hash
    aggregates: max per (pair, a-token position), mean per pair. All work
    is bounded by |pairs| * |A| * |B| with token lists dictionary-small
    (names are a handful of tokens); the corpus-scale join already
    happened at blocking time.
    """
    ia, ib = id_cols
    # one row per (pair, a-token); B-token array rides along.
    melted = pairs.select(
        ia, ib, F.posexplode(tokens_a).alias("pos_a", "tok_a"), F.col(tokens_b)
    )
    # micro-round the inner JW BEFORE aggregating: integer max/sum are
    # order-invariant, so the cross-engine value check never depends on
    # float summation order (only the final division is a double, and it
    # divides two exact integers — deterministic in both engines).
    inner = melted.select(
        ia, ib, "pos_a", "tok_a", F.explode(tokens_b).alias("tok_b")
    ).withColumn(
        "jw_micro",
        F.round(jaro_winkler_pudf(F.col("tok_a"), F.col("tok_b")) * MICRO).cast(
            "long"
        ),
    )
    best = inner.groupBy(ia, ib, "pos_a").agg(
        F.max("jw_micro").alias("best_micro")
    )
    return best.groupBy(ia, ib).agg(
        F.round(
            F.sum("best_micro").cast("double") / F.count(F.lit(1))
        )
        .cast("long")
        .alias("me_micro")
    )
