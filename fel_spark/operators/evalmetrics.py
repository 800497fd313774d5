"""Clustering evaluation metrics: B-cubed and Adjusted Rand Index.

The reference evaluates linking accuracy query-by-query against Webscope
labels (`utils/EvaluateUtils.java`, `plans/pipeline.pairwise_f1` here).
Entity-RESOLUTION output is a clustering, and the standard clustering
metrics — B-cubed precision/recall (Bagga & Baldwin 1998, the
coreference community's default) and the Adjusted Rand Index (Hubert &
Arabie 1985) — both reduce to aggregates over the (pred, gold)
contingency table, which Spark computes in ONE corpus-scale hash
aggregate:

    cell(p, g) = #records with pred=p and gold=g

    B3 precision = (1/N) * sum_cells c^2 / |pred cluster|
    B3 recall    = (1/N) * sum_cells c^2 / |gold cluster|
    ARI = (a - E) / (M - E),  a = sum_cells C(c,2),
          E = b1*b2/C(N,2),   M = (b1+b2)/2,
          b1 = sum_pred C(|p|,2), b2 = sum_gold C(|g|,2)

(the per-record average of |cell|/|cluster| groups into c * (c/|cluster|)
per cell — the c^2 form above; ARI's a/b1/b2 are exact integers, so the
only doubles are the final ratios).

Everything after the contingency aggregate is dictionary-scale (at most
#pred x #gold occupied cells). No pair materialization anywhere — the
c^2 identity replaces the O(sum c^2) record-pair self-join the naive
formulation would shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bcubed_ari(
    assign: DataFrame,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """One-row DataFrame: n_records, B-cubed precision/recall/F1 and ARI
    in micro units (round(1e6 * x) — engine-replayable integer output).

    ``assign`` has one row per record with its predicted and gold
    cluster ids. F1 is computed as (2.0 * p * r) / (p + r) in that
    exact op order (an oracle replay must mirror it)."""
    cells = assign.groupBy(pred_col, gold_col).agg(F.count("*").alias("c"))
    pred_sizes = cells.groupBy(pred_col).agg(F.sum("c").alias("pn"))
    gold_sizes = cells.groupBy(gold_col).agg(F.sum("c").alias("gn"))
    j = cells.join(pred_sizes, pred_col).join(gold_sizes, gold_col)
    per_cell = j.agg(
        F.sum(F.col("c") * F.col("c") / F.col("pn")).alias("sp"),
        F.sum(F.col("c") * F.col("c") / F.col("gn")).alias("sg"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("a"),
        F.sum("c").cast("long").alias("n"),
    )
    b1 = pred_sizes.agg(
        F.sum(F.col("pn") * (F.col("pn") - 1) / 2).cast("long").alias("b1")
    )
    b2 = gold_sizes.agg(
        F.sum(F.col("gn") * (F.col("gn") - 1) / 2).cast("long").alias("b2")
    )
    s = per_cell.crossJoin(F.broadcast(b1)).crossJoin(F.broadcast(b2))
    p = F.col("sp") / F.col("n")
    r = F.col("sg") / F.col("n")
    n2 = F.col("n") * (F.col("n") - 1) / 2
    e = F.col("b1") * F.col("b2") / n2
    m = (F.col("b1") + F.col("b2")) / 2.0
    ari = F.when(m - e == 0, F.lit(1.0)).otherwise((F.col("a") - e) / (m - e))
    return s.select(
        F.col("n").alias("n_records"),
        F.round(p * 1000000).cast("long").alias("b3_p_micro"),
        F.round(r * 1000000).cast("long").alias("b3_r_micro"),
        F.round((F.lit(2.0) * p * r) / (p + r) * 1000000)
        .cast("long")
        .alias("b3_f1_micro"),
        F.round(ari * 1000000).cast("long").alias("ari_micro"),
    )


def vmeasure(
    assign: DataFrame,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """Homogeneity / completeness / V-measure (Rosenberg & Hirschberg
    2007) — the entropy-based counterpart to B-cubed, over the same
    one-aggregate contingency table:

        h = 1 - H(gold|pred) / H(gold)    (1.0 when H(gold) = 0)
        c = 1 - H(pred|gold) / H(pred)    (1.0 when H(pred) = 0)
        v = 2hc / (h + c)                 (0.0 when h + c = 0)

    All entropies are plain sums over the dictionary-scale table of
    cell/marginal count ratios (natural log); output in micro units.
    One corpus-scale hash aggregate, no pair materialization — same
    posture as :func:`bcubed_ari`.
    """
    cells = assign.groupBy(pred_col, gold_col).agg(F.count("*").alias("c"))
    pred_sizes = cells.groupBy(pred_col).agg(F.sum("c").alias("pn"))
    gold_sizes = cells.groupBy(gold_col).agg(F.sum("c").alias("gn"))
    j = cells.join(pred_sizes, pred_col).join(gold_sizes, gold_col)
    # H(gold|pred) = -sum (c/N) ln(c/pn); H(pred|gold) symmetric.
    cond = j.agg(
        F.sum(F.col("c") * F.log(F.col("c") / F.col("pn"))).alias("s_gp"),
        F.sum(F.col("c") * F.log(F.col("c") / F.col("gn"))).alias("s_pg"),
        F.sum("c").cast("long").alias("n"),
    )
    hp = pred_sizes.agg(
        F.sum(F.col("pn") * F.log(F.col("pn"))).alias("s_p")
    )
    hg = gold_sizes.agg(
        F.sum(F.col("gn") * F.log(F.col("gn"))).alias("s_g")
    )
    s = cond.crossJoin(F.broadcast(hp)).crossJoin(F.broadcast(hg))
    n = F.col("n").cast("double")
    # H(X) = ln(N) - (1/N) sum n_x ln(n_x): exact same op order as the
    # SQL replay; all H >= 0 up to float error.
    h_gold = F.log(n) - F.col("s_g") / n
    h_pred = F.log(n) - F.col("s_p") / n
    h_gold_given_pred = -F.col("s_gp") / n
    h_pred_given_gold = -F.col("s_pg") / n
    h = F.when(h_gold == 0.0, F.lit(1.0)).otherwise(
        F.lit(1.0) - h_gold_given_pred / h_gold
    )
    c = F.when(h_pred == 0.0, F.lit(1.0)).otherwise(
        F.lit(1.0) - h_pred_given_gold / h_pred
    )
    v = F.when(h + c == 0.0, F.lit(0.0)).otherwise(
        F.lit(2.0) * h * c / (h + c)
    )
    return s.select(
        F.col("n").alias("n_records"),
        F.round(h * 1000000).cast("long").alias("homogeneity_micro"),
        F.round(c * 1000000).cast("long").alias("completeness_micro"),
        F.round(v * 1000000).cast("long").alias("vmeasure_micro"),
    )


def muc_score(
    assign: DataFrame,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """MUC link-based clustering score (Vilain et al., MUC-6 1995 — the
    original coreference-resolution metric, still the standard
    link-counting complement to B-cubed): recall counts, per gold
    cluster g, the minimum links needed to re-connect g given the
    predicted partition — ``|g| - p(g)`` where p(g) = number of distinct
    predicted clusters intersecting g — against the ``|g| - 1`` links of
    a perfect clustering; precision is the mirror image with pred and
    gold swapped.

    Both reduce to the same (pred, gold) contingency table as
    :func:`bcubed_ari`: p(g) is the column's occupied-cell count, |g|
    the column sum — ONE corpus-scale hash aggregate, then
    dictionary-scale algebra. Every record must carry both a pred and a
    gold id (records unresolved by the system are conventionally passed
    in as their own singleton pred clusters).

    Output: one row — n_records, muc_p_micro, muc_r_micro,
    muc_f1_micro. Degenerate denominators (all-singleton gold for
    recall / all-singleton pred for precision) score 0; f1 =
    2pr/(p+r) in that op order, 0 when p + r = 0.
    """
    cells = assign.groupBy(pred_col, gold_col).agg(F.count("*").alias("c"))
    by_gold = cells.groupBy(gold_col).agg(
        F.sum("c").alias("gn"), F.count("*").alias("gp")
    )
    by_pred = cells.groupBy(pred_col).agg(
        F.sum("c").alias("pn"), F.count("*").alias("pp")
    )
    rec = by_gold.agg(
        F.sum(F.col("gn") - F.col("gp")).cast("long").alias("r_num"),
        F.sum(F.col("gn") - 1).cast("long").alias("r_den"),
        F.sum("gn").cast("long").alias("n"),
    )
    prc = by_pred.agg(
        F.sum(F.col("pn") - F.col("pp")).cast("long").alias("p_num"),
        F.sum(F.col("pn") - 1).cast("long").alias("p_den"),
    )
    s = rec.crossJoin(F.broadcast(prc))
    r = F.when(F.col("r_den") == 0, F.lit(0.0)).otherwise(
        F.col("r_num") / F.col("r_den")
    )
    p = F.when(F.col("p_den") == 0, F.lit(0.0)).otherwise(
        F.col("p_num") / F.col("p_den")
    )
    return s.select(
        F.col("n").alias("n_records"),
        F.round(p * 1000000).cast("long").alias("muc_p_micro"),
        F.round(r * 1000000).cast("long").alias("muc_r_micro"),
        F.when(p + r == 0.0, F.lit(0))
        .otherwise(F.round(F.lit(2.0) * p * r / (p + r) * 1000000))
        .cast("long")
        .alias("muc_f1_micro"),
    )


def blanc_score(
    assign: DataFrame,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """BLANC clustering score (Recasens & Hovy, "BLANC: Implementing the
    Rand index for coreference evaluation", Natural Language Engineering
    2011): the Rand-index family member of the standard coreference
    quartet (MUC / B-cubed / CEAF / BLANC — the other three are
    :func:`muc_score`, :func:`bcubed_ari`, :func:`ceaf_scores`). It
    averages an F-score on COREFERENCE LINKS (record pairs co-clustered
    in pred and gold) with an F-score on NON-LINKS (pairs separated in
    both), so singleton-heavy ER graphs can't saturate the metric the
    way raw Rand does.

    Every quantity is exact integer pair-count algebra over the same
    one-aggregate (pred, gold) contingency table as the rest of the
    family: with cell counts c, pred sizes pn, gold sizes gn, N records:

    * rc  = sum C(c, 2)                      (links right)
    * L_p = sum C(pn, 2), L_g = sum C(gn, 2), T = C(N, 2)
    * rn  = T - L_p - L_g + rc               (non-links right)
    * P_c = rc/L_p, R_c = rc/L_g; P_n = rn/(T-L_p), R_n = rn/(T-L_g)
    * BLANC = (F_c + F_n)/2, with the paper's boundary conventions:
      no coref links in BOTH pred and gold -> BLANC = F_n alone; no
      non-links in both -> BLANC = F_c alone; a 0 denominator inside a
      P/R scores 0 and F = 2pr/(p+r) (0 when p + r = 0).

    Output: one row — n_records, links_right, nonlinks_right,
    blanc_fc_micro, blanc_fn_micro, blanc_micro (micro = round(1e6*x),
    engine-replayable integers).

    Scale: ONE corpus-scale hash aggregate (the contingency cells),
    then dictionary-scale sums — identical shape to `muc_score`.
    """
    cells = assign.groupBy(pred_col, gold_col).agg(F.count("*").alias("c"))
    per = cells.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("rc"),
        F.sum("c").cast("long").alias("n"),
    )
    lp = (
        cells.groupBy(pred_col)
        .agg(F.sum("c").alias("pn"))
        .agg(F.sum(F.col("pn") * (F.col("pn") - 1) / 2).cast("long").alias("lp"))
    )
    lg = (
        cells.groupBy(gold_col)
        .agg(F.sum("c").alias("gn"))
        .agg(F.sum(F.col("gn") * (F.col("gn") - 1) / 2).cast("long").alias("lg"))
    )
    s = per.crossJoin(F.broadcast(lp)).crossJoin(F.broadcast(lg))
    t = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    s = s.select(
        "n", "rc", "lp", "lg", t.alias("t"),
        (t - F.col("lp") - F.col("lg") + F.col("rc")).alias("rn"),
    )

    def _ratio(num, den):
        return F.when(den == 0, F.lit(0.0)).otherwise(num / den)

    p_c = _ratio(F.col("rc"), F.col("lp"))
    r_c = _ratio(F.col("rc"), F.col("lg"))
    p_n = _ratio(F.col("rn"), F.col("t") - F.col("lp"))
    r_n = _ratio(F.col("rn"), F.col("t") - F.col("lg"))

    def _f(p, r):
        return F.when(p + r == 0.0, F.lit(0.0)).otherwise(
            F.lit(2.0) * p * r / (p + r)
        )

    f_c = _f(p_c, r_c)
    f_n = _f(p_n, r_n)
    blanc = (
        F.when((F.col("lp") == 0) & (F.col("lg") == 0), f_n)
        .when(
            (F.col("t") - F.col("lp") == 0) & (F.col("t") - F.col("lg") == 0),
            f_c,
        )
        .otherwise((f_c + f_n) / 2.0)
    )
    return s.select(
        F.col("n").alias("n_records"),
        F.col("rc").alias("links_right"),
        F.col("rn").cast("long").alias("nonlinks_right"),
        F.round(f_c * 1000000).cast("long").alias("blanc_fc_micro"),
        F.round(f_n * 1000000).cast("long").alias("blanc_fn_micro"),
        F.round(blanc * 1000000).cast("long").alias("blanc_micro"),
    )


def ceaf_scores(
    assign: DataFrame,
    pred_col: str = "pred",
    gold_col: str = "gold",
    max_rounds: int = 6,
) -> DataFrame:
    """CEAF cluster-alignment scores (Luo, EMNLP 2005): align predicted
    and gold clusters ONE-TO-ONE maximizing total cluster similarity,
    then score the alignment — the entity-based complement to MUC's
    links and B-cubed's records. Both of Luo's similarities at once:

    * phi3 (mention-based, CEAF-m): |p n g| — precision = recall =
      (matched overlap) / N when pred and gold both cover every record;
    * phi4 (entity-based, CEAF-e): 2|p n g| / (|p| + |g|), micro-rounded
      BEFORE matching so the greedy order is engine-neutral; precision
      divides by #pred clusters, recall by #gold clusters.

    Luo's alignment is the optimal assignment (Kuhn-Munkres) — a
    sequential O(n^3) algorithm with no distributed form. This
    implementation substitutes the DETERMINISTIC GREEDY alignment
    (:func:`fel_spark.operators.matching.one_to_one_greedy` on the
    contingency cells, phi4-micro score order, ``max_rounds`` bounded)
    — the standard 1/2-approximation, run on the dictionary-scale cell
    table (#pred x #gold occupied cells, never record-scale). On
    typical ER contingency tables (sharply diagonal) greedy and optimal
    coincide; the docstring-level caveat is the honest price of a
    distributed CEAF.

    Output: one row — n_records, ceaf_m_micro (p = r = F1 by
    construction), ceaf_e_p_micro, ceaf_e_r_micro, ceaf_e_f1_micro
    (2pr/(p+r) in that op order, 0 when p + r = 0).
    """
    from fel_spark.operators.matching import one_to_one_greedy

    cells = assign.groupBy(pred_col, gold_col).agg(F.count("*").alias("c"))
    pred_sizes = cells.groupBy(pred_col).agg(F.sum("c").alias("pn"))
    gold_sizes = cells.groupBy(gold_col).agg(F.sum("c").alias("gn"))
    scored = (
        cells.join(pred_sizes, pred_col)
        .join(gold_sizes, gold_col)
        .select(
            F.col(pred_col).alias("id_a"),
            F.col(gold_col).alias("id_b"),
            F.col("c"),
            F.round(
                F.lit(2.0) * F.col("c") / (F.col("pn") + F.col("gn"))
                * 1_000_000
            )
            .cast("long")
            .alias("score"),
        )
    )
    matched = one_to_one_greedy(scored, max_rounds=max_rounds)
    msum = matched.agg(
        F.sum("c").cast("long").alias("m_sum"),
        F.sum("score").cast("long").alias("e_sum_micro"),
    )
    totals = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.count_distinct(F.col(pred_col)).alias("n_pred"),
        F.count_distinct(F.col(gold_col)).alias("n_gold"),
    )
    s = totals.crossJoin(F.broadcast(msum)).select(
        "n",
        "n_pred",
        "n_gold",
        F.coalesce("m_sum", F.lit(0)).alias("m_sum"),
        F.coalesce("e_sum_micro", F.lit(0)).alias("e_sum_micro"),
    )
    p = F.col("e_sum_micro") / 1_000_000.0 / F.col("n_pred")
    r = F.col("e_sum_micro") / 1_000_000.0 / F.col("n_gold")
    return s.select(
        F.col("n").alias("n_records"),
        F.round(F.col("m_sum") / F.col("n") * 1_000_000)
        .cast("long")
        .alias("ceaf_m_micro"),
        F.round(p * 1_000_000).cast("long").alias("ceaf_e_p_micro"),
        F.round(r * 1_000_000).cast("long").alias("ceaf_e_r_micro"),
        F.when(p + r == 0.0, F.lit(0))
        .otherwise(F.round(F.lit(2.0) * p * r / (p + r) * 1_000_000))
        .cast("long")
        .alias("ceaf_e_f1_micro"),
    )


def threshold_curve(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "is_match",
) -> DataFrame:
    """Precision / recall / F1 at every distinct score threshold — the
    calibration sweep that picks a linkage decision threshold (the FS
    three-way bands' empirical counterpart; Christen 2012 ch.7).

    For each distinct score s (as threshold "predict match iff score >=
    s"): tp/fp from cumulative sums DESC over the score-keyed aggregate,
    fn = total matches - tp. ONE corpus-scale aggregate keyed by score;
    the cumulative window runs on the dictionary-scale distinct-score
    table (single-partition by construction — bounded by the score
    dictionary, not the corpus). Ratios divide exact integers; micro
    units; f1 = 2pr/(p+r) in that op order, 0 when tp = 0.
    """
    from pyspark.sql import Window

    per_score = scored.groupBy(F.col(score_col).alias("thr")).agg(
        F.sum(F.col(label_col).cast("long")).alias("m"),
        F.sum((~F.col(label_col).cast("boolean")).cast("long")).alias("u"),
    )
    w = Window.orderBy(F.col("thr").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_score.select(
        "thr",
        F.sum("m").over(w).cast("long").alias("tp"),
        F.sum("u").over(w).cast("long").alias("fp"),
    )
    tot = per_score.agg(F.sum("m").cast("long").alias("total_m"))
    p = F.col("tp") / (F.col("tp") + F.col("fp"))
    # degenerate corpus with zero labeled matches: recall defined as 0
    r = F.when(F.col("total_m") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / F.col("total_m")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "thr",
            "tp",
            "fp",
            (F.col("total_m") - F.col("tp")).cast("long").alias("fn"),
            F.round(p * 1000000).cast("long").alias("prec_micro"),
            F.round(r * 1000000).cast("long").alias("rec_micro"),
            F.when(F.col("tp") == 0, F.lit(0))
            .otherwise(F.round(F.lit(2.0) * p * r / (p + r) * 1000000))
            .cast("long")
            .alias("f1_micro"),
        )
    )


def correlation_objective(
    edges: DataFrame,
    assign: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Correlation-clustering disagreement count (Bansal, Blum & Chawla
    2004) — the objective :func:`fel_spark.operators.matching.
    pivot_clusters` (KwikCluster) 3-approximates, as an auditable
    number: disagreements = CUT similar pairs (edges crossing clusters)
    + MISSING similar pairs (within-cluster record pairs that share no
    edge). Lower is better; 0 means the clustering is exactly the
    edge-defined clique cover. Comparing this across CC / star / pivot
    output on the same edge set is how a pipeline picks its decision
    layer.

    ``edges`` is the undirected similar-pair set (each pair once);
    ``assign`` one row per record. Within-cluster possible pairs come
    from cluster SIZES (C(n,2) — never materialized); the only
    pair-scale work is the already-materialized edge list, joined
    id-keyed to cluster assignments. Output: one row — n_records,
    n_edges, n_cut, n_missing_within, disagreements (all exact longs).
    """
    a_src = assign.select(
        F.col(id_col).alias(src_col), F.col(cluster_col).alias("_c_src")
    )
    a_dst = assign.select(
        F.col(id_col).alias(dst_col), F.col(cluster_col).alias("_c_dst")
    )
    e2 = edges.join(a_src, src_col).join(a_dst, dst_col)
    edge_counts = e2.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum(
            (F.col("_c_src") != F.col("_c_dst")).cast("long")
        ).alias("n_cut"),
    )
    sizes = assign.groupBy(cluster_col).agg(F.count("*").alias("n"))
    poss = sizes.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias(
            "n_within_possible"
        ),
        F.sum("n").cast("long").alias("n_records"),
    )
    s = poss.crossJoin(F.broadcast(edge_counts)).select(
        "n_records",
        F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
        F.coalesce("n_cut", F.lit(0)).alias("n_cut"),
        "n_within_possible",
    )
    missing = (
        F.col("n_within_possible")
        - (F.col("n_edges") - F.col("n_cut"))
    ).cast("long")
    return s.select(
        "n_records",
        "n_edges",
        "n_cut",
        missing.alias("n_missing_within"),
        (F.col("n_cut") + missing).cast("long").alias("disagreements"),
    )


def cluster_edge_audit(
    edges: DataFrame,
    assign: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Per-cluster graph-quality audit — the QA pass a production ER
    pipeline runs on its transitive clusters: connected components can
    chain A~B~C into one entity with A and C sharing NO direct match
    edge, and this report is how that over-merge risk is seen.

    For each cluster: member count, within-cluster match edges, the
    n(n-1)/2 possible edges, edge DENSITY (1.0 = the cluster is a
    clique, every member pair was directly matched; low density = long
    chains worth clerical review), and EXTERNAL edges (score edges
    crossing the cluster boundary — nonzero means the clustering
    dropped evidence, e.g. a threshold disagreement).

    Scale shape: two id-keyed joins to attach cluster ids to edge
    endpoints, then cluster-keyed hash aggregates — nothing pair-scale
    beyond the already-materialized edge list. Singletons report 0/0
    edges with NULL density and is_clique = true (vacuous).
    """
    a_src = assign.select(
        F.col(id_col).alias("src"), F.col(cluster_col).alias("_c_src")
    )
    a_dst = assign.select(
        F.col(id_col).alias("dst"), F.col(cluster_col).alias("_c_dst")
    )
    e2 = edges.join(a_src, "src").join(a_dst, "dst")
    within = (
        e2.filter(F.col("_c_src") == F.col("_c_dst"))
        .groupBy(F.col("_c_src").alias(cluster_col))
        .agg(F.count("*").alias("n_edges"))
    )
    crossing = e2.filter(F.col("_c_src") != F.col("_c_dst"))
    external = (
        crossing.select(F.col("_c_src").alias(cluster_col))
        .unionAll(crossing.select(F.col("_c_dst").alias(cluster_col)))
        .groupBy(cluster_col)
        .agg(F.count("*").alias("n_external"))
    )
    sizes = assign.groupBy(cluster_col).agg(F.count("*").alias("n_nodes"))
    n = F.col("n_nodes")
    poss = (n * (n - 1) / 2).cast("long")
    out = (
        sizes.join(within, cluster_col, "left")
        .join(external, cluster_col, "left")
        .fillna(0, subset=["n_edges", "n_external"])
    )
    return out.select(
        cluster_col,
        "n_nodes",
        F.col("n_edges").cast("long").alias("n_edges"),
        poss.alias("n_possible"),
        F.when(
            poss > 0,
            F.round(F.col("n_edges") / poss * 1_000_000).cast("long"),
        ).alias("density_micro"),
        F.col("n_external").cast("long").alias("n_external"),
        (poss == F.col("n_edges")).alias("is_clique"),
    )


def gmd_scores(
    assign: DataFrame,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """Generalized Merge Distance (Menestrina, Whang & Garcia-Molina,
    "Evaluating entity resolution results", VLDB 2010): the edit
    distance between partitions under split/merge operations — the
    paper's "slice" algorithm turns the predicted clustering into the
    gold one by first SPLITTING every predicted cluster into its
    gold-pure parts, then MERGING parts per gold cluster. Two standard
    cost instantiations, both closed-form over the same one-aggregate
    (pred, gold) contingency table as the rest of this module:

    * unit costs (f = 1 per operation): splits = C - P, merges = C - G,
      where C = occupied contingency cells, P/G = predicted/gold
      cluster counts — ``gmd_unit = (C - P) + (C - G)``. (The paper's
      basic merge distance; equals the minimum operation count because
      every split/merge is forced.)
    * pair costs (f(x, y) = x*y): each split/merge pays the record
      pairs it separates/joins, and GMD collapses to the PAIRWISE
      DISAGREEMENT count — ``gmd_pair = L_p + L_g - 2*rc`` with
      L_p/L_g = within-pred/within-gold pair counts and rc = pairs
      co-clustered in both (Theorem: GMD generalizes pairwise
      precision/recall, sec. 4 of the paper).

    Output: one row — n_records, n_pred_clusters, n_gold_clusters,
    n_cells, gmd_splits, gmd_merges, gmd_unit, gmd_pair. All exact
    BIGINT math; no floats anywhere.
    """
    cells = assign.groupBy(pred_col, gold_col).agg(F.count("*").alias("c"))
    s = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("cc"),
        F.countDistinct(pred_col).cast("long").alias("p"),
        F.countDistinct(gold_col).cast("long").alias("g"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("rc"),
    )
    lp = (
        cells.groupBy(pred_col)
        .agg(F.sum("c").alias("pn"))
        .agg(F.sum(F.col("pn") * (F.col("pn") - 1) / 2).cast("long").alias("lp"))
    )
    lg = (
        cells.groupBy(gold_col)
        .agg(F.sum("c").alias("gn"))
        .agg(F.sum(F.col("gn") * (F.col("gn") - 1) / 2).cast("long").alias("lg"))
    )
    return (
        s.crossJoin(F.broadcast(lp))
        .crossJoin(F.broadcast(lg))
        .select(
            F.col("n").alias("n_records"),
            F.col("p").alias("n_pred_clusters"),
            F.col("g").alias("n_gold_clusters"),
            F.col("cc").alias("n_cells"),
            (F.col("cc") - F.col("p")).alias("gmd_splits"),
            (F.col("cc") - F.col("g")).alias("gmd_merges"),
            (2 * F.col("cc") - F.col("p") - F.col("g")).alias("gmd_unit"),
            (F.col("lp") + F.col("lg") - 2 * F.col("rc")).alias("gmd_pair"),
        )
    )


def info_scores(
    assign: DataFrame,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """Information-theoretic partition distances over the one-aggregate
    contingency table: mutual information, Variation of Information
    (Meila, "Comparing clusterings — an information based distance",
    J. Multivariate Analysis 2007 — a true METRIC on partitions, unlike
    the F-style scores), and max-normalized NMI (Strehl & Ghosh 2002
    family; the max normalization keeps NMI <= 1 and metric-compatible:
    1 - NMI_max is a distance).

        I(P; G)  = H(P) + H(G) - H(P, G)
        VI(P, G) = H(P) + H(G) - 2 I(P; G)
        NMI_max  = I / max(H(P), H(G))     (1.0 when both entropies 0 —
                                            identical trivial partitions)

    Natural-log entropies via the same ``ln N - (1/N) sum n ln n`` op
    order as :func:`vmeasure` (the SQL replay mirrors it term for
    term). Output in micro units: n_records, mi_micro, vi_micro,
    nmi_micro. One corpus-scale hash aggregate; everything after is
    dictionary-scale.
    """
    cells = assign.groupBy(pred_col, gold_col).agg(F.count("*").alias("c"))
    joint = cells.agg(
        F.sum(F.col("c") * F.log(F.col("c"))).alias("s_j"),
        F.sum("c").cast("long").alias("n"),
    )
    hp = (
        cells.groupBy(pred_col)
        .agg(F.sum("c").alias("pn"))
        .agg(F.sum(F.col("pn") * F.log(F.col("pn"))).alias("s_p"))
    )
    hg = (
        cells.groupBy(gold_col)
        .agg(F.sum("c").alias("gn"))
        .agg(F.sum(F.col("gn") * F.log(F.col("gn"))).alias("s_g"))
    )
    s = joint.crossJoin(F.broadcast(hp)).crossJoin(F.broadcast(hg))
    n = F.col("n").cast("double")
    h_p = F.log(n) - F.col("s_p") / n
    h_g = F.log(n) - F.col("s_g") / n
    h_pg = F.log(n) - F.col("s_j") / n
    mi = h_p + h_g - h_pg
    vi = h_p + h_g - F.lit(2.0) * mi
    nmi = F.when(
        F.greatest(h_p, h_g) == 0.0, F.lit(1.0)
    ).otherwise(mi / F.greatest(h_p, h_g))
    return s.select(
        F.col("n").alias("n_records"),
        F.round(mi * 1000000).cast("long").alias("mi_micro"),
        F.round(vi * 1000000).cast("long").alias("vi_micro"),
        F.round(nmi * 1000000).cast("long").alias("nmi_micro"),
    )
