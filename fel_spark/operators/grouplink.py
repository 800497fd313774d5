"""Group linkage: match GROUPS of records by aligning their members.

On, Koudas, Lee & Srivastava, "Group Linkage" (ICDE 2007): when the
unit of resolution is a SET of records — a conversation is a set of
turns, a household a set of people, an author a set of papers — link
two groups by the value of a one-to-one alignment between their
members, normalized Jaccard-style:

    BMS(A, B) = sum of matched member-pair sims / (|A| + |B| - n_matched)

so identical groups score 1, disjoint ones 0, and partial overlap
degrades smoothly. This is the transcript-native linkage shape for this
engine: conversations resolve to each other through their turns, not
through any single field.

Engine mapping:

- the member alignment reuses :func:`matching.one_to_one_greedy` (Preis
  locally-dominant rounds, deterministic under (score DESC, id ASC)),
  made PER GROUP PAIR by matching on composite vertices
  ``group_a|group_b|member`` — edges only exist within one group pair
  per composite vertex, so every group pair's greedy assignment runs
  independently inside the same two window ranks per round (no per-pair
  loop, no groupBy-apply);
- member sims arrive as 4dp fixed-point ints; the matched-sim sum is an
  exact integer, and the final BMS is emitted as ``bms_4dp`` =
  floor(sum_4dp / denom) with denom = |A| + |B| - n_matched — division
  of two exact ints, replayable bit-for-bit in ANSI SQL.

Scale shape: the turn-pair set is bounded by the caller's group-pair
blocking; the alignment is max_rounds * (2 window ranks + 2 anti-joins)
partitioned by composite vertex keys; group sizes are one hash agg; the
final roll-up one more. No cartesian beyond the declared candidate
group pairs, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fel_spark.operators.matching import one_to_one_greedy

SEP = "|"


def group_linkage(
    member_pairs: DataFrame,
    sizes: DataFrame,
    group_a: str = "ga",
    group_b: str = "gb",
    member_a: str = "ma",
    member_b: str = "mb",
    sim_col: str = "sim_4dp",
    min_sim: int = 9000,
    max_rounds: int = 3,
) -> DataFrame:
    """Aggregate member-level similarities into group-level BMS scores.

    ``member_pairs``: one row per candidate member pair across a
    candidate group pair — (group_a, group_b, member_a, member_b,
    sim_4dp). ``sizes``: (group, n) member counts covering every group
    appearing on either side. Member pairs below ``min_sim`` never enter
    the alignment (On et al.'s edge threshold).

    Output: one row per candidate group pair — (group_a, group_b,
    n_a, n_b, n_matched, sum_sim_4dp, bms_4dp).
    """
    strong = member_pairs.filter(F.col(sim_col) >= min_sim)
    edges = strong.select(
        F.col(group_a),
        F.col(group_b),
        F.concat_ws(
            SEP, F.col(group_a), F.col(group_b), F.col(member_a)
        ).alias("_va"),
        F.concat_ws(
            SEP, F.col(group_a), F.col(group_b), F.col(member_b)
        ).alias("_vb"),
        F.col(sim_col).cast("long").alias("_s"),
    )
    matched = one_to_one_greedy(
        edges, id_a="_va", id_b="_vb", score_col="_s", max_rounds=max_rounds
    )
    per_pair = matched.groupBy(group_a, group_b).agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum("_s").cast("long").alias("sum_sim_4dp"),
    )
    # every candidate group pair appears in the output, even align-less
    all_pairs = member_pairs.select(group_a, group_b).distinct()
    na = sizes.select(F.col("group").alias(group_a), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("group").alias(group_b), F.col("n").alias("n_b"))
    out = (
        all_pairs.join(na, group_a)
        .join(nb, group_b)
        .join(per_pair, [group_a, group_b], "left")
        .withColumn("n_matched", F.coalesce("n_matched", F.lit(0)).cast("long"))
        .withColumn(
            "sum_sim_4dp", F.coalesce("sum_sim_4dp", F.lit(0)).cast("long")
        )
    )
    denom = F.col("n_a") + F.col("n_b") - F.col("n_matched")
    return out.withColumn(
        "bms_4dp", F.floor(F.col("sum_sim_4dp") / denom).cast("long")
    ).select(
        group_a,
        group_b,
        F.col("n_a").cast("long"),
        F.col("n_b").cast("long"),
        "n_matched",
        "sum_sim_4dp",
        "bms_4dp",
    )
