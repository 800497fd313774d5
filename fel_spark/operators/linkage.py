"""Fellegi-Sunter probabilistic record linkage: m/u estimation + scoring.

The canonical probabilistic framework for pairwise match scoring
(Fellegi & Sunter 1969, JASA; the model behind Splink and most modern
linkage engines). For each comparison feature k with binary agreement
gamma_k on a candidate pair:

    m_k = P(gamma_k = 1 | pair is a match)
    u_k = P(gamma_k = 1 | pair is a non-match)

    agreement weight     w_a(k) = log2(m_k / u_k)
    disagreement weight  w_d(k) = log2((1 - m_k) / (1 - u_k))

A pair's match score is the sum of per-feature weights (the
log-likelihood ratio under conditional independence). The reference
ranks alias candidates with exactly this shape of count-derived
log-ratio score (`ranker/ProbabilityRanker.java` — prior/conditional
count ratios); FS generalizes it to arbitrary agreement features.

Scale shape: estimation melts the feature columns map-side (explode of
a literal-width array — no shuffle) and reduces in ONE hash aggregate
keyed by feature (dictionary-scale output). Scoring joins the tiny
per-feature weight table (broadcast) against the melted pairs and
re-aggregates per pair — one pair-keyed shuffle, nothing beyond the
candidate-pair set the blocking stage already bounded.

Probabilities are add-half (Jeffreys) smoothed — (agree + 0.5) /
(n + 1.0) — so zero/complete agreement never yields infinite weights,
and the arithmetic replays engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _melt_features(
    pairs: DataFrame, feature_cols: list[str], keep: list[str]
) -> DataFrame:
    kvs = F.array(
        *[
            F.struct(
                F.lit(c).alias("feature"),
                F.col(c).cast("long").alias("gamma"),
            )
            for c in feature_cols
        ]
    )
    return pairs.select(*keep, F.explode(kvs).alias("kv")).select(
        *keep, "kv.feature", "kv.gamma"
    )


def fs_weights(
    labeled_pairs: DataFrame,
    feature_cols: list[str],
    label_col: str = "is_match",
) -> DataFrame:
    """Estimate per-feature m/u and log2 agreement/disagreement weights
    from labeled candidate pairs (one row per pair; ``feature_cols`` are
    0/1 agreement indicators, ``label_col`` is the 0/1 gold label).

    Returns one row per feature: raw counts (n_match, n_nonmatch,
    n_agree_match, n_agree_nonmatch — all BIGINT) plus smoothed
    m/u and weights in micro units (round(1e6 * x))."""
    lbl = F.col(label_col).cast("long")
    melted = _melt_features(
        labeled_pairs.withColumn("_lbl", lbl), feature_cols, ["_lbl"]
    )
    g = melted.groupBy("feature").agg(
        F.sum("_lbl").cast("long").alias("n_match"),
        F.sum(1 - F.col("_lbl")).cast("long").alias("n_nonmatch"),
        F.sum(F.col("gamma") * F.col("_lbl"))
        .cast("long")
        .alias("n_agree_match"),
        F.sum(F.col("gamma") * (1 - F.col("_lbl")))
        .cast("long")
        .alias("n_agree_nonmatch"),
    )
    m = (F.col("n_agree_match") + 0.5) / (F.col("n_match") + 1.0)
    u = (F.col("n_agree_nonmatch") + 0.5) / (F.col("n_nonmatch") + 1.0)
    return g.select(
        "feature",
        "n_match",
        "n_nonmatch",
        "n_agree_match",
        "n_agree_nonmatch",
        F.round(m * 1000000).cast("long").alias("m_micro"),
        F.round(u * 1000000).cast("long").alias("u_micro"),
        F.round(F.log2(m / u) * 1000000).cast("long").alias("w_agree_micro"),
        F.round(F.log2((1 - m) / (1 - u)) * 1000000)
        .cast("long")
        .alias("w_disagree_micro"),
    )


def fs_score(
    pairs: DataFrame,
    weights: DataFrame,
    feature_cols: list[str],
    id_cols: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Score candidate pairs with FS weights: per pair, sum w_agree for
    agreeing features and w_disagree for disagreeing ones (micro units,
    exact integer addition — no float sum-order sensitivity). Returns
    (id_a, id_b, fs_score_micro, n_agree)."""
    melted = _melt_features(pairs, feature_cols, list(id_cols))
    w = F.broadcast(
        weights.select("feature", "w_agree_micro", "w_disagree_micro")
    )
    scored = melted.join(w, "feature")
    contrib = F.when(
        F.col("gamma") == 1, F.col("w_agree_micro")
    ).otherwise(F.col("w_disagree_micro"))
    return scored.groupBy(*id_cols).agg(
        F.sum(contrib).cast("long").alias("fs_score_micro"),
        F.sum("gamma").cast("long").alias("n_agree"),
    )


def fs_em_train(
    pairs: DataFrame,
    feature_cols: list[str],
    iters: int = 3,
    lam0: float = 0.5,
    m0: float = 0.9,
    u0: float = 0.1,
) -> DataFrame:
    """UNSUPERVISED m/u estimation via expectation-maximization — the
    label-free path (Winkler 1988; the estimation engine inside Splink).

    The scale insight: pairs with the same agreement PATTERN have the
    same posterior match probability, so EM never needs per-pair state —
    it runs on the 2^K pattern histogram. The only corpus-scale work is
    ONE hash aggregate (groupBy over the K binary features, map-side
    combined); the fixed-iteration EM loop then runs driver-side on the
    <= 2^K collected rows (the same gated dictionary-scale pattern as
    BPE merge training — `tokenizer.py`).

    Per iteration, for each pattern g (count c):

        pm = lam * prod_k (m_k if g_k else 1 - m_k)
        pu = (1 - lam) * prod_k (u_k if g_k else 1 - u_k)
        p  = pm / (pm + pu)
        lam' = sum(p c) / sum(c);  m_k' = sum(p c g_k) / sum(p c)
        u_k' = sum((1-p) c g_k) / sum((1-p) c)

    Complements are always computed as ``1 - x`` (never a pre-negated
    literal) so an engine replay is IEEE-identical. Patterns are summed
    in sorted-pattern order; outputs are micro-unit integers (half-up),
    which absorbs sum-order ulps.

    Returns one row per feature: (feature, m_micro, u_micro) plus the
    self-describing constants lambda_micro, n_pairs.
    """
    import math

    k = len(feature_cols)
    hist_rows = sorted(
        (tuple(int(r[c]) for c in feature_cols), int(r["c"]))
        for r in pairs.groupBy(*feature_cols)
        .agg(F.count("*").alias("c"))
        .collect()
    )
    lam = lam0
    m = [m0] * k
    u = [u0] * k
    for _ in range(iters):
        sp = sc = 0.0
        spg = [0.0] * k
        sqg = [0.0] * k
        sq = 0.0
        for g, c in hist_rows:
            pm = lam
            pu = 1 - lam
            for j in range(k):
                pm *= m[j] if g[j] else 1 - m[j]
                pu *= u[j] if g[j] else 1 - u[j]
            p = pm / (pm + pu)
            sp += p * c
            sq += (1 - p) * c
            sc += c
            for j in range(k):
                spg[j] += p * c * g[j]
                sqg[j] += (1 - p) * c * g[j]
        lam = sp / sc
        m = [spg[j] / sp for j in range(k)]
        u = [sqg[j] / sq for j in range(k)]

    def micro(x: float) -> int:
        return int(math.floor(x * 1000000 + 0.5))

    n_pairs = sum(c for _, c in hist_rows)
    out = [
        (feature_cols[j], micro(m[j]), micro(u[j]), micro(lam), n_pairs)
        for j in range(k)
    ]
    return pairs.sparkSession.createDataFrame(
        out,
        "feature string, m_micro long, u_micro long, "
        "lambda_micro long, n_pairs long",
    )


def fs_weights_from_mu(mu: DataFrame) -> DataFrame:
    """Derive log2 agreement/disagreement weights from an (m, u) table
    in micro units (e.g. `fs_em_train` output) — the bridge that makes
    the unsupervised path feed `fs_score` directly. The division by 1e6
    and the log2 arguments are formed identically engine-side and in
    the SQL replay."""
    m = F.col("m_micro") / 1000000.0
    u = F.col("u_micro") / 1000000.0
    return mu.select(
        "feature",
        F.round(F.log2(m / u) * 1000000).cast("long").alias("w_agree_micro"),
        F.round(F.log2((1 - m) / (1 - u)) * 1000000)
        .cast("long")
        .alias("w_disagree_micro"),
    )


def fs_posteriors(
    pairs: DataFrame,
    params: DataFrame,
    feature_cols: list[str],
    id_cols: tuple[str, str] = ("id_a", "id_b"),
    upper: float = 0.9,
    lower: float = 0.1,
) -> DataFrame:
    """The predict step: posterior match probability per pair under the
    estimated FS model (`fs_em_train` output), plus the Fellegi-Sunter
    three-way decision rule — 'match' above ``upper``, 'non_match'
    below ``lower``, 'possible' (the clerical-review band) between.

        pm = lam * prod_k (m_k if gamma_k else 1 - m_k)
        pu = (1 - lam) * prod_k (u_k if gamma_k else 1 - u_k)
        posterior = pm / (pm + pu)

    The k-row parameter table is collected (dictionary-scale, like the
    EM loop itself) and burned into pure column literals — the scoring
    pass is map-only whole-stage-codegen arithmetic, no join at all.
    Products are left-associated in feature order and complements are
    in-engine ``1 - x`` so a SQL replay is IEEE-identical. Returns
    (id_a, id_b, posterior_micro, decision)."""
    rows = {r["feature"]: r for r in params.collect()}
    lam = rows[feature_cols[0]]["lambda_micro"] / 1e6
    pm = F.lit(lam)
    pu = F.lit(1 - lam)
    for f in feature_cols:
        m = rows[f]["m_micro"] / 1e6
        u = rows[f]["u_micro"] / 1e6
        g = F.col(f) == 1
        pm = pm * F.when(g, F.lit(m)).otherwise(F.lit(1 - m))
        pu = pu * F.when(g, F.lit(u)).otherwise(F.lit(1 - u))
    post = F.round(pm / (pm + pu) * 1000000).cast("long")
    return pairs.select(
        *id_cols,
        post.alias("posterior_micro"),
        F.when(post > int(upper * 1000000), F.lit("match"))
        .when(post >= int(lower * 1000000), F.lit("possible"))
        .otherwise(F.lit("non_match"))
        .alias("decision"),
    )


def fs_optimal_thresholds(
    pairs: DataFrame,
    params: DataFrame,
    feature_cols: list[str],
    mu: float = 0.01,
    lam: float = 0.05,
) -> DataFrame:
    """Fellegi-Sunter Theorem 1: OPTIMAL three-way decision regions
    from target error budgets (Fellegi & Sunter JASA 1969, §3 — the
    theorem `fs_posteriors`' fixed 0.1/0.9 cutoffs approximate). Given
    per-feature conditional agreement probabilities (``params`` =
    `fs_em_train` / `fs_weights` output with m_micro/u_micro), order
    the FULL 2^k agreement-pattern lattice by likelihood ratio
    P(gamma|M) / P(gamma|U) descending; the link region A1 is the
    longest top prefix whose cumulative u-mass stays within ``mu``
    (target false-match rate among declared links), the non-link
    region A3 the longest bottom suffix whose cumulative m-mass stays
    within ``lam`` (target false-non-match rate), and the clerical
    band A2 is what remains — provably the minimal clerical band at
    those error levels. Patterns never observed in ``pairs`` still get
    a decision (n_pairs = 0): the rule must cover future inputs.

    Engine-neutral arithmetic per the repo's FS convention: products
    left-associated in feature order, complements in-engine ``1 - x``,
    micro params divided by 1000000.0 — so a SQL replay is
    IEEE-identical; probability outputs are rounded to ppb longs.
    Ties in the ratio order break by the gamma columns DESC (total
    order, both engines). Scale: one pattern-histogram aggregate over
    the pairs (the only corpus-scale work — map-side combinable),
    then a 2^k-row lattice with two windows; params are collected
    driver-side exactly like the EM loop that produced them.

    Returns one row per pattern: gamma columns, n_pairs, rnk,
    pm_ppb, pu_ppb, cum_u_ppb, cum_m_rev_ppb, decision
    ('link' | 'possible' | 'non_link')."""
    spark = pairs.sparkSession
    rows = {r["feature"]: r for r in params.collect()}
    lattice = spark.range(2).select(F.col("id").alias(feature_cols[0]))
    for f in feature_cols[1:]:
        lattice = lattice.crossJoin(
            spark.range(2).select(F.col("id").alias(f))
        )
    hist = pairs.groupBy(
        *[F.col(f).cast("long").alias(f) for f in feature_cols]
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    pm, pu = F.lit(1.0), F.lit(1.0)
    for f in feature_cols:
        m = rows[f]["m_micro"] / 1e6
        u = rows[f]["u_micro"] / 1e6
        g = F.col(f) == 1
        pm = pm * F.when(g, F.lit(m)).otherwise(F.lit(1 - m))
        pu = pu * F.when(g, F.lit(u)).otherwise(F.lit(1 - u))
    base = (
        lattice.join(hist, feature_cols, "left")
        .select(
            *feature_cols,
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            pm.alias("_pm"),
            pu.alias("_pu"),
            (pm / pu).alias("_ratio"),
        )
    )
    order = [F.col("_ratio").desc()] + [F.col(f).desc() for f in feature_cols]
    w_top = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rev = [F.col("_ratio").asc()] + [F.col(f).asc() for f in feature_cols]
    w_bot = (
        Window.orderBy(*rev)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = base.select(
        *feature_cols,
        "n_pairs",
        F.row_number().over(Window.orderBy(*order)).alias("rnk"),
        F.round(F.col("_pm") * 1e9).cast("long").alias("pm_ppb"),
        F.round(F.col("_pu") * 1e9).cast("long").alias("pu_ppb"),
        F.sum("_pu").over(w_top).alias("_cum_u"),
        F.sum("_pm").over(w_bot).alias("_cum_m_rev"),
    )
    return ranked.select(
        *feature_cols,
        "n_pairs",
        "rnk",
        "pm_ppb",
        "pu_ppb",
        F.round(F.col("_cum_u") * 1e9).cast("long").alias("cum_u_ppb"),
        F.round(F.col("_cum_m_rev") * 1e9).cast("long").alias("cum_m_rev_ppb"),
        F.when(F.col("_cum_u") <= mu, F.lit("link"))
        .when(F.col("_cum_m_rev") <= lam, F.lit("non_link"))
        .otherwise(F.lit("possible"))
        .alias("decision"),
    )


def tf_adjustments(
    records: DataFrame,
    value_col: str,
) -> DataFrame:
    """Winkler term-frequency adjustment table (Winkler 1990; Splink's
    `term_frequency_adjustments`): agreement on a COMMON value ("Smith")
    is weaker evidence than agreement on a rare one ("Zylberberg"). For
    field value v with relative frequency f_v, the value-specific
    non-match agreement probability is u_v = f_v, so the agreement
    weight correction is

        tf_adj(v) = log2(u_field / f_v),   u_field = sum_v f_v^2

    (negative for values more common than the field average, positive
    for rarer ones; adding it to the base agreement weight yields
    log2(m / f_v)). Returns (value, n_value, f_micro, tf_adj_micro).

    Scale: one hash aggregate over the field (dictionary-scale output)
    + a 1-row broadcast totals cross join. sum f^2 rides
    sum(n^2)/total^2 with n^2 summed in DOUBLE (BIGINT would overflow
    past ~3e9 rows per value; sum order is absorbed by micro rounding),
    and total^2 is formed as double * long for the same reason. NULL
    values get no row (a NULL never counts as agreement).
    """
    counts = (
        records.select(F.col(value_col).alias("value"))
        .where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count("*").cast("long").alias("n_value"))
    )
    tot = counts.agg(
        F.sum("n_value").cast("long").alias("n_total"),
        F.sum((F.col("n_value") * F.col("n_value")).cast("double")).alias(
            "sum_sq"
        ),
    )
    j = counts.crossJoin(F.broadcast(tot))
    f = F.col("n_value") / F.col("n_total")
    u = F.col("sum_sq") / (F.col("n_total").cast("double") * F.col("n_total"))
    return j.select(
        "value",
        "n_value",
        F.round(f * 1000000).cast("long").alias("f_micro"),
        F.round(F.log2(u / f) * 1000000).cast("long").alias("tf_adj_micro"),
    )


def apply_tf_adjustment(
    scored: DataFrame,
    tf: DataFrame,
    agree_col: str,
    value_col: str,
    score_col: str = "fs_score_micro",
) -> DataFrame:
    """Add the value-specific TF correction to FS pair scores: for pairs
    that AGREE on the field (``agree_col`` = 1), score += tf_adj(value);
    disagreeing pairs are untouched. Plain equi-join on the shared value
    (AQE decides broadcast vs shuffle — a high-cardinality field's tf
    table is NOT broadcast-safe at corpus scale), exact integer add."""
    t = tf.select(
        F.col("value").alias(value_col), F.col("tf_adj_micro")
    )
    out = scored.join(t, value_col, "left")
    adj = F.when(
        (F.col(agree_col) == 1) & F.col("tf_adj_micro").isNotNull(),
        F.col("tf_adj_micro"),
    ).otherwise(F.lit(0))
    return out.withColumn(
        score_col, (F.col(score_col) + adj).cast("long")
    ).drop("tf_adj_micro")


def incremental_assign(
    new_records: DataFrame,
    existing: DataFrame,
    threshold_micro: int = 850_000,
    id_col: str = "record_id",
    key_col: str = "key",
    block_col: str = "bk",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Assign a batch of NEW records to existing entity clusters — the
    attach half of the standard lambda split for incremental ER (the
    cluster map is recomputed by the periodic batch job; arrivals
    between recomputes join the current map). Mirrors FEL's
    candidate-then-rank shape: blocked join against existing members,
    Jaro-Winkler score per candidate, engine-neutral argmax
    (score DESC, cluster ASC, member ASC), attach when the best score
    clears ``threshold_micro``; otherwise the record seeds a new
    cluster (NULL cluster_id + is_new = true — surrogate allocation is
    the caller's transaction).

    Scale shape: one blocked equi-join bounded by the blocking stage,
    the Arrow-batched JW kernel, one per-new-record window argmax. New
    records whose block matches nothing surface with NULL score (left
    join) — never silently dropped.
    """
    from pyspark.sql import Window

    from fel_spark.functions.sim import jaro_winkler_pudf

    n = new_records.select(
        F.col(id_col).alias("record_id"),
        F.col(key_col).alias("_k_new"),
        F.col(block_col).alias("_bk"),
    )
    e = existing.select(
        F.col(id_col).alias("member_id"),
        F.col(cluster_col).alias("_cl"),
        F.col(key_col).alias("_k_old"),
        F.col(block_col).alias("_bk"),
    )
    # the JW pudf null-FILLS its inputs; an unblocked arrival (left-join
    # miss) must surface NULL, not jw(key, "") = 0
    cand = n.join(e, "_bk", "left").withColumn(
        "jw_micro",
        F.when(
            F.col("_k_old").isNotNull(),
            F.round(
                jaro_winkler_pudf(F.col("_k_new"), F.col("_k_old")) * 1_000_000
            ).cast("long"),
        ),
    )
    w = Window.partitionBy("record_id").orderBy(
        F.col("jw_micro").desc_nulls_last(),
        F.col("_cl").asc_nulls_last(),
        F.col("member_id").asc_nulls_last(),
    )
    best = cand.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    attached = F.col("jw_micro") >= threshold_micro
    return best.select(
        "record_id",
        F.when(attached, F.col("_cl")).alias("cluster_id"),
        F.when(attached, F.col("member_id")).alias("matched_id"),
        F.col("jw_micro").alias("best_jw_micro"),
        (~F.coalesce(attached, F.lit(False))).alias("is_new"),
    )


def fs_weights_multilevel(
    labeled_pairs: DataFrame,
    feature_levels: dict[str, int],
    label_col: str = "is_match",
) -> DataFrame:
    """Multi-LEVEL Fellegi-Sunter estimation — graded agreement instead
    of binary gamma (Splink's "comparison levels"; Winkler's extended FS
    model). Each feature k carries an integer level column in
    [0, L_k): e.g. exact / close / far for a length comparison. Per
    (feature, level):

        m_kl = P(level = l | match),  u_kl = P(level = l | non-match)
        w_kl = log2(m_kl / u_kl)

    with Dirichlet-Jeffreys smoothing (c + 0.5) / (n + 0.5 * L_k) so
    unseen levels get finite weights and the L_k-level simplex still
    sums to 1. One map-side melt + ONE (feature, level)-keyed hash
    aggregate over the corpus-scale pairs; everything after is
    dictionary-scale. Returns (feature, level, n_match, n_nonmatch,
    m_micro, u_micro, w_micro) for every level in range — including
    levels observed zero times (seeded from the declared level counts,
    not the data).
    """
    lbl = F.col(label_col).cast("long")
    kvs = F.array(
        *[
            F.struct(
                F.lit(k).alias("feature"),
                F.col(k).cast("long").alias("level"),
            )
            for k in feature_levels
        ]
    )
    melted = labeled_pairs.select(
        lbl.alias("_lbl"), F.explode(kvs).alias("kv")
    ).select("_lbl", "kv.feature", "kv.level")
    counts = melted.groupBy("feature", "level").agg(
        F.sum("_lbl").cast("long").alias("n_match"),
        F.sum(1 - F.col("_lbl")).cast("long").alias("n_nonmatch"),
    )
    # seed the full (feature, level) grid so unseen levels emit smoothed
    # rows (the SQL replay generates the same grid)
    spark = labeled_pairs.sparkSession
    grid = spark.createDataFrame(
        [(k, lv) for k, n in feature_levels.items() for lv in range(n)],
        "feature string, level long",
    )
    full = grid.join(counts, ["feature", "level"], "left").fillna(
        0, subset=["n_match", "n_nonmatch"]
    )
    tot = labeled_pairs.agg(
        F.sum(lbl).cast("long").alias("_tm"),
        F.sum(1 - lbl).cast("long").alias("_tu"),
    )
    nlv = spark.createDataFrame(
        [(k, float(n)) for k, n in feature_levels.items()],
        "feature string, n_levels double",
    )
    j = full.join(F.broadcast(nlv), "feature").crossJoin(F.broadcast(tot))
    m = (F.col("n_match") + 0.5) / (F.col("_tm") + 0.5 * F.col("n_levels"))
    u = (F.col("n_nonmatch") + 0.5) / (
        F.col("_tu") + 0.5 * F.col("n_levels")
    )
    return j.select(
        "feature",
        "level",
        "n_match",
        "n_nonmatch",
        F.round(m * 1_000_000).cast("long").alias("m_micro"),
        F.round(u * 1_000_000).cast("long").alias("u_micro"),
        F.round(F.log2(m / u) * 1_000_000).cast("long").alias("w_micro"),
    )


def fs_score_multilevel(
    pairs: DataFrame,
    weights: DataFrame,
    feature_cols: list[str],
    id_cols: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Score pairs under the multi-level model: per pair, sum the
    (feature, level) weights its observed levels select — exact integer
    addition of micro-unit weights. Returns (id_a, id_b, fs_score_micro).

    r6 shape: one broadcast weight LOOKUP JOIN per feature, summed as
    columns — fully map-side; the pair stream is never exploded
    per-feature or pair-keyed-shuffled (guide §2.4). Semantics match the
    melt+aggregate formulation exactly, including the edge cases: a
    feature level missing from the weight grid contributes nothing, and
    a pair whose EVERY level is missing disappears (with the full
    declared grid fs_weights_multilevel emits, nothing is ever missing)."""
    ia, ib = id_cols
    out = pairs.select(ia, ib, *feature_cols)
    matched = []
    for k in feature_cols:
        wk = F.broadcast(
            weights.filter(F.col("feature") == k).select(
                F.col("level").alias(f"_l_{k}"),
                F.col("w_micro").alias(f"_w_{k}"),
            )
        )
        out = out.join(
            wk, F.col(k).cast("long") == F.col(f"_l_{k}"), "left"
        )
        matched.append(F.col(f"_w_{k}"))
    any_match = None
    total = None
    for m in matched:
        hit = m.isNotNull()
        any_match = hit if any_match is None else (any_match | hit)
        term = F.coalesce(m, F.lit(0))
        total = term if total is None else total + term
    return out.filter(any_match).select(
        ia, ib, total.cast("long").alias("fs_score_micro")
    )


def fs_em_train_multilevel(
    pairs: DataFrame,
    feature_levels: dict[str, int],
    iters: int = 3,
    lam0: float = 0.5,
) -> DataFrame:
    """UNSUPERVISED estimation for the multi-LEVEL FS model via EM — the
    label-free path for graded comparison levels (what Splink's
    estimate_parameters does over its comparison levels).

    Same scale gate as :func:`fs_em_train`: pairs sharing a level
    PATTERN share a posterior, so EM runs on the prod(L_k)-row pattern
    histogram — ONE corpus-scale hash aggregate, then a driver-side
    fixed-iteration loop on the dictionary-scale histogram.

    Per iteration, for pattern g (count c):

        pm = lam * prod_k m_k[g_k]      (left-associated, feature order)
        pu = (1 - lam) * prod_k u_k[g_k]
        p  = pm / (pm + pu)
        m_k[l]' = sum(p c [g_k = l]) / sum(p c);  u symmetric with 1 - p

    Init: m0_k[l] = 2(l+1)/(L(L+1)) (mass increasing with agreement
    level), u0_k[l] = 2(L-l)/(L(L+1)) (decreasing) — both exact level
    simplexes. The SQL replay burns the identical IEEE doubles via
    repr() literals, mirrors every arithmetic form, and diverges only
    in pattern-sum order (absorbed by micro rounding).

    Returns (feature, level, m_micro, u_micro, lambda_micro, n_pairs).
    """
    import math

    feats = list(feature_levels)
    ls = [feature_levels[f] for f in feats]
    hist_rows = sorted(
        (tuple(int(r[f]) for f in feats), int(r["c"]))
        for r in pairs.groupBy(*feats).agg(F.count("*").alias("c")).collect()
    )
    lam = lam0
    m = [[2.0 * (l + 1) / (n * (n + 1)) for l in range(n)] for n in ls]
    u = [[2.0 * (n - l) / (n * (n + 1)) for l in range(n)] for n in ls]
    for _ in range(iters):
        sp = sq = sc = 0.0
        spg = [[0.0] * n for n in ls]
        sqg = [[0.0] * n for n in ls]
        for g, c in hist_rows:
            pm = lam
            pu = 1 - lam
            for j in range(len(feats)):
                pm *= m[j][g[j]]
                pu *= u[j][g[j]]
            p = pm / (pm + pu)
            sp += p * c
            sq += (1 - p) * c
            sc += c
            for j in range(len(feats)):
                spg[j][g[j]] += p * c
                sqg[j][g[j]] += (1 - p) * c
        lam = sp / sc
        m = [[spg[j][l] / sp for l in range(ls[j])] for j in range(len(feats))]
        u = [[sqg[j][l] / sq for l in range(ls[j])] for j in range(len(feats))]

    def micro(x: float) -> int:
        return int(math.floor(x * 1000000 + 0.5))

    n_pairs = sum(c for _, c in hist_rows)
    out = [
        (feats[j], l, micro(m[j][l]), micro(u[j][l]), micro(lam), n_pairs)
        for j in range(len(feats))
        for l in range(ls[j])
    ]
    return pairs.sparkSession.createDataFrame(
        out,
        "feature string, level long, m_micro long, u_micro long, "
        "lambda_micro long, n_pairs long",
    )


FS_MODEL_VERSION = 1


def save_fs_model(weights: DataFrame, path: str) -> None:
    """Persist a trained FS model (any of the weight-table shapes:
    `fs_weights`, `fs_weights_from_mu`, `fs_weights_multilevel`,
    `fs_em_train*` output) as a versioned JSON artifact — the train-once
    / score-later deployment split (Splink's save_model_to_json). The
    table is dictionary-scale by construction (rows bounded by features
    x levels), so a driver-side collect is the correct altitude; the
    artifact stores the schema alongside the rows so load restores
    exact types (micro-unit weights stay exact integers end to end).
    """
    import json

    rows = [r.asDict() for r in weights.collect()]
    artifact = {
        "fs_model_version": FS_MODEL_VERSION,
        "schema": weights.schema.json(),
        "rows": rows,
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(artifact, f, sort_keys=True)


def load_fs_model(spark, path: str) -> DataFrame:
    """Load a `save_fs_model` artifact back into a DataFrame with the
    exact original schema. Raises on unknown artifact versions rather
    than misreading a future layout."""
    import json

    from pyspark.sql.types import StructType

    with open(path, encoding="utf-8") as f:
        artifact = json.load(f)
    ver = artifact.get("fs_model_version")
    if ver != FS_MODEL_VERSION:
        raise ValueError(
            f"unsupported fs_model_version {ver!r} "
            f"(this build reads {FS_MODEL_VERSION})"
        )
    schema = StructType.fromJson(json.loads(artifact["schema"]))
    return spark.createDataFrame(
        [tuple(r[f.name] for f in schema.fields) for r in artifact["rows"]],
        schema,
    )


def fs_explain(
    pairs: DataFrame,
    weights: DataFrame,
    feature_cols: list[str],
    id_cols: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Per-feature score breakdown for candidate pairs — the waterfall
    view (Splink's waterfall chart data): one row per (pair, feature)
    with the feature's gamma, the weight it selected, and the running
    cumulative score in the DECLARED feature order (deterministic: the
    order is part of the explanation's contract). The final cumulative
    row equals `fs_score`'s total by construction — exact integer
    addition throughout. Shape: the same melt + broadcast weight join
    as scoring, plus one pair-keyed window over the k declared features
    (k-row partitions — dictionary-width, not corpus-scale)."""
    from pyspark.sql import Window

    ia, ib = id_cols
    spark = pairs.sparkSession
    order = F.broadcast(
        spark.createDataFrame(
            [(f, i) for i, f in enumerate(feature_cols)],
            "feature string, _ord int",
        )
    )
    melted = _melt_features(pairs, feature_cols, [ia, ib]).join(
        order, "feature"
    )
    w = F.broadcast(
        weights.select("feature", "w_agree_micro", "w_disagree_micro")
    )
    contrib = F.when(
        F.col("gamma") == 1, F.col("w_agree_micro")
    ).otherwise(F.col("w_disagree_micro"))
    win = Window.partitionBy(ia, ib).orderBy("_ord").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        melted.join(w, "feature")
        .withColumn("w_micro", contrib.cast("long"))
        .withColumn(
            "cum_score_micro", F.sum("w_micro").over(win).cast("long")
        )
        .select(ia, ib, "feature", "gamma", "w_micro", "cum_score_micro")
    )


def fs_multilevel_weights_from_mu(mu: DataFrame) -> DataFrame:
    """Bridge `fs_em_train_multilevel` output to `fs_score_multilevel`:
    w_kl = log2(m_kl / u_kl) from the ROUNDED micro m/u (so a replay
    from the persisted model artifact reproduces scores bit-exactly).
    EM can drive a level's probability below 0.5e-6 — rounding to ZERO
    micro-units — so both sides are floored at one micro-unit (the
    rounded-model analogue of smoothing; keeps every weight finite).
    Dictionary-scale column math."""
    m = F.greatest(F.col("m_micro"), F.lit(1)) / 1_000_000.0
    u = F.greatest(F.col("u_micro"), F.lit(1)) / 1_000_000.0
    return mu.select(
        "feature",
        "level",
        F.round(F.log2(m / u) * 1_000_000).cast("long").alias("w_micro"),
    )


def uncertain_pairs(
    scored: DataFrame,
    threshold: int,
    k: int,
    score_col: str = "score_micro",
    strata_col: str | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Active-learning pair selection: the k pairs nearest the decision
    boundary (uncertainty sampling, Sarawagi & Bhamidipaty KDD 2002 —
    the ALIAS loop's query step; Settles 2009 survey).

    Review budget goes where the model is least sure: margin =
    |score - threshold|, ranked ascending with the engine-neutral
    (margin, id_a, id_b) total order — never raw-score ties alone, the
    repo's ranking convention. With ``strata_col`` the top-k is taken
    PER STRATUM (block, source, score band): that is both the sampling
    design a labeling pipeline wants (coverage across blocks, not k
    near-identical pairs from one hot block) and the scale shape —
    bounded window partitions instead of one global sort. Global top-k
    (strata_col=None) stays available for dictionary-scale pair sets.

    Output: input columns + margin_micro + sel_rank (1-based within
    stratum). Labels produced from these pairs feed `fs_em_train` /
    `fs_weights` as the seed set.
    """
    from pyspark.sql import Window

    margin = (F.col(score_col) - F.lit(threshold)).cast("long")
    margin = F.when(margin < 0, -margin).otherwise(margin)
    out = scored.withColumn("margin_micro", margin)
    part = (
        Window.partitionBy(strata_col)
        if strata_col is not None
        else Window.partitionBy(F.lit(1))
    )
    w = part.orderBy(F.col("margin_micro"), F.col(id_a), F.col(id_b))
    return (
        out.withColumn("sel_rank", F.row_number().over(w))
        .filter(F.col("sel_rank") <= k)
    )
