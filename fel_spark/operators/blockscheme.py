"""Blocking-scheme learning: greedy sequential covering over rules.

Michelson & Knoblock, "Learning Blocking Schemes for Record Linkage"
(AAAI 2006; also Bilenko et al. ICDM 2006 "Adaptive Blocking"): given
labeled matched pairs and a library of candidate blocking predicates,
LEARN which disjunction of predicates to run — each added rule should
recover new true matches without flooding the candidate set. This
completes the blocking story here: `blocking.blocking_rule_coverage`
evaluates a scheme the user DECLARED; this module chooses one.

Deterministic greedy variant (the sequential-covering core, with the
randomized training split removed so every engine replays it):

    step t: pick the rule covering the most labeled pairs NOT yet
    covered by previously selected rules (ties: lower total pair cost,
    then rule name) — stop when no rule adds >= min_gain new matches
    or after max_rules steps.

Engine mapping / scale shape: per-rule coverage of the labeled pairs
and per-rule candidate-pair costs are hash aggregates over the keyed
corpus (distributed; cost = sum over blocks of C(n,2) without ever
enumerating pairs). The greedy loop itself runs on the DRIVER over a
|rules|-row aggregate per step (dictionary-scale collects, the
tokenizer-merge-loop convention) — rules are human-curated and few;
the corpus never leaves the cluster. The selection is a pure function
of exact integer counts, so an ANSI oracle replays each step with an
ORDER BY ... LIMIT 1 argmax CTE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def rule_keys(
    df: DataFrame, id_col: str, rules: dict[str, Column]
) -> DataFrame:
    """Long-format (id, rule, key) blocking keys; null keys dropped on
    both engines (a null key blocks nothing)."""
    parts = [
        df.select(
            F.col(id_col).alias("id"),
            F.lit(name).alias("rule"),
            expr.cast("string").alias("key"),
        )
        for name, expr in rules.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("key").isNotNull())


def learn_blocking_scheme(
    keyed: DataFrame,
    labeled: DataFrame,
    max_rules: int = 3,
    min_gain: int = 1,
) -> DataFrame:
    """Greedy scheme selection. ``keyed``: (id, rule, key) from
    :func:`rule_keys`. ``labeled``: matched training pairs (id_a, id_b),
    already orientation-normalized and distinct.

    Output: one row per selected rule, in selection order — (step,
    rule, new_matches, cum_matches, cost_pairs, recall_4dp) where
    cost_pairs is the rule's own candidate-pair budget (sum of C(n,2)
    over its blocks) and recall_4dp = floor(cum_matches * 10000 /
    n_labeled).
    """
    spark = keyed.sparkSession
    ka = keyed.select(
        F.col("id").alias("id_a"), "rule", F.col("key").alias("_k")
    )
    kb = keyed.select(
        F.col("id").alias("id_b"), "rule", F.col("key").alias("_k")
    )
    cov = (
        labeled.join(ka, "id_a")
        .join(kb, ["id_b", "rule", "_k"])
        .select("rule", "id_a", "id_b")
        .persist()
    )
    costs = {
        r["rule"]: r["cost"]
        for r in keyed.groupBy("rule", "key")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("rule")
        .agg(
            F.sum(((F.col("c") * (F.col("c") - 1)) / 2).cast("long"))
            .cast("long")
            .alias("cost")
        )
        .collect()
    }
    n_labeled = labeled.count()

    selected: list[tuple] = []
    covered: DataFrame | None = None
    cum = 0
    for step in range(1, max_rules + 1):
        rem = cov if covered is None else cov.join(
            covered, ["id_a", "id_b"], "left_anti"
        )
        gains = {
            r["rule"]: r["g"]
            for r in rem.groupBy("rule").agg(F.count(F.lit(1)).alias("g")).collect()
        }
        cand = [
            (g, costs.get(rule, 0), rule)
            for rule, g in gains.items()
            if g >= min_gain and rule not in {s[1] for s in selected}
        ]
        if not cand:
            break
        # max gain, then cheaper rule, then name — the deterministic
        # total order the oracle replays with ORDER BY ... LIMIT 1
        gain, cost, rule = sorted(cand, key=lambda t: (-t[0], t[1], t[2]))[0]
        cum += gain
        selected.append(
            (step, rule, int(gain), int(cum), int(cost), cum * 10000 // n_labeled)
        )
        picked = cov.filter(F.col("rule") == rule).select("id_a", "id_b")
        covered = picked if covered is None else covered.unionByName(
            picked
        ).distinct()
    cov.unpersist()
    return spark.createDataFrame(
        selected,
        "step int, rule string, new_matches long, cum_matches long, "
        "cost_pairs long, recall_4dp long",
    )
