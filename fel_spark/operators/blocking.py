"""Blocking: MinHash-LSH + dictionary blocking keys, hot-key capping,
candidate-pair self-join.

FEL never self-joins at scale — its candidate generation is a dictionary
probe (`hash/QuasiSuccinctEntityHash.java:79-82`). At ER scale the analogue
is a blocked self-join: mentions sharing a blocking key become candidate
pairs. Keys:

- ``e<entity_id>``  dictionary block (mentions linked to the same candidate
  entity — FEL's own notion of a match);
- LSH band keys over char bigrams of the mention surface (catches
  same-entity mentions whose dictionary rankings disagree / typo surfaces).

Zipf-hot aliases create quadratic blocks; we salt keys above a size cap
(every lost intra-block edge is recoverable through the other keys +
transitive closure) and log dropped volume. AQE skew-join splitting is ON
(session.py) for the residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fel_spark.functions.hashing import lsh_band_keys, minhash_signatures_df
from fel_spark.functions.text import char_bigrams

DEFAULT_BANDS = 4
DEFAULT_ROWS_PER_BAND = 2
DEFAULT_MAX_BLOCK = 200


def blocking_keys(
    mentions: DataFrame,
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    use_entity_block: bool = True,
) -> DataFrame:
    """Explode each mention into its blocking keys -> (block_key, mention...).

    The signature is computed by the explode+min-aggregate plan
    (:func:`minhash_signatures_df`) — fully codegen'd, map-side combined —
    then banded from the materialized array (never from an inline expression,
    which would re-evaluate the whole signature per band).
    """
    with_sig = minhash_signatures_df(
        mentions,
        char_bigrams(F.col("span")),
        mentions.columns,
        bands * rows_per_band,
    )
    keys = lsh_band_keys(F.col("sig"), bands, rows_per_band)
    if use_entity_block:
        keys = F.array_union(
            keys, F.array(F.concat(F.lit("e"), F.col("entity_id").cast("string")))
        )
    return with_sig.withColumn("block_key", F.explode(keys)).drop("sig")


def cap_blocks(
    blocked: DataFrame,
    max_block: int = DEFAULT_MAX_BLOCK,
    salt_col: str = "mention_id",
) -> DataFrame:
    """Split oversized blocks by a deterministic salt so no block exceeds
    ~max_block rows. Pairs across salt shards of the same block are lost by
    construction — the multi-key design + connected components restores
    cluster connectivity (same mitigation class as AQE skew-join splitting,
    which handles the residual shuffle skew).
    """
    sizes = blocked.groupBy("block_key").agg(F.count("*").alias("block_size"))
    out = blocked.join(F.broadcast(sizes.filter(F.col("block_size") > max_block)), "block_key", "left")
    n_shards = F.ceil(F.col("block_size") / max_block)
    salted = F.when(
        F.col("block_size").isNotNull(),
        F.concat_ws(
            "/",
            F.col("block_key"),
            F.pmod(F.xxhash64(F.col(salt_col)), n_shards).cast("string"),
        ),
    ).otherwise(F.col("block_key"))
    return out.withColumn("block_key", salted).drop("block_size")


def capped_block_stats(
    blocked: DataFrame, max_block: int = DEFAULT_MAX_BLOCK
) -> DataFrame:
    """Quantify what :func:`cap_blocks` drops — the audit row a 100 TB run
    logs next to its lineage metrics (the "log dropped volume" half of the
    salting contract; the ER ops path records it per stage in
    `plans/metrics.py`).

    One-row DataFrame: hot-block count, rows inside hot blocks, exact
    intra-block pair count before salting, and the estimated pairs
    surviving after the salt split (shards of ~max_block rows) — the
    difference is the recall the cap trades for boundedness, recoverable
    via multi-key blocking + transitive closure.
    """
    sizes = blocked.groupBy("block_key").agg(F.count("*").alias("s"))
    hot = sizes.filter(F.col("s") > max_block)
    n_shards = F.ceil(F.col("s") / max_block)
    pairs_before = (F.col("s") * (F.col("s") - 1) / 2).cast("long")
    per_shard = F.col("s") / n_shards
    pairs_after = (
        n_shards * (per_shard * (per_shard - 1) / 2)
    ).cast("long")
    return hot.agg(
        F.count("*").alias("n_hot_blocks"),
        F.coalesce(F.sum("s"), F.lit(0)).cast("long").alias("rows_in_hot_blocks"),
        F.coalesce(F.sum(pairs_before), F.lit(0)).cast("long").alias("pairs_before_cap"),
        F.coalesce(F.sum(pairs_after), F.lit(0)).cast("long").alias("est_pairs_after_cap"),
    )


def candidate_pairs(
    blocked: DataFrame,
    id_col: str = "mention_id",
    payload_cols: tuple[str, ...] = ("span", "entity_id", "entity_key", "score"),
) -> DataFrame:
    """Self-join on block_key with id_a < id_b; dedup pairs found via
    multiple keys. The join shuffles both sides on block_key — co-partitioned
    sort-merge by construction; AQE splits skewed partitions at runtime.
    """
    cols = [id_col, *payload_cols, "block_key"]
    a = blocked.select([F.col(c).alias(f"{c}_a") for c in cols[:-1]] + [F.col("block_key")])
    b = blocked.select([F.col(c).alias(f"{c}_b") for c in cols[:-1]] + [F.col("block_key")])
    pairs = a.join(b, "block_key").filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
    return pairs.dropDuplicates([f"{id_col}_a", f"{id_col}_b"])


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 20,
) -> DataFrame:
    """Per-key skew histogram — the diagnostic a shuffle-heavy job runs
    BEFORE picking its salting / AQE strategy (`capped_block_stats` is
    the post-hoc audit of what the cap then dropped; this is the
    ex-ante view of WHICH keys are hot and how hot).

    Returns the ``top_n`` heaviest keys with their row count, share of
    all rows in micro units (round(1e6 * n / total) — engine-replayable
    integer output), the total key cardinality and row count (constant
    columns, so one row of the report is self-describing in a log), and
    a rank on the engine-neutral (n DESC, key ASC) key.

    Scale: one hash aggregate (map-side combined, so the shuffle is
    #distinct keys, not #rows), a 1-row totals aggregate broadcast by
    cross join, and a TakeOrderedAndProject top-n — no global sort, no
    global window over the key table.
    """
    from pyspark.sql import Window

    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("n_keys"),
    )
    order = [F.col("n").desc()] + [F.col(c).asc() for c in key_cols]
    top = counts.orderBy(*order).limit(top_n)
    win = Window.partitionBy().orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(win).cast("int"))
        .crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n",
            F.round(F.col("n") * 1000000.0 / F.col("total_rows"))
            .cast("long")
            .alias("share_6dp"),
            "rank",
            "total_rows",
            "n_keys",
        )
    )


def blocking_quality(
    blocked: DataFrame,
    gold: DataFrame,
    id_col: str = "record_id",
    gold_col: str = "gold",
) -> DataFrame:
    """Blocking-scheme evaluation (Christen, *Data Matching* 2012, ch. 7):
    reduction ratio, pairs completeness (blocking recall) and pairs
    quality (blocking precision) — the three numbers that decide whether
    a blocking key is usable BEFORE the expensive scoring pass runs.

    ``blocked`` has one row per (record, block_key) assignment (a record
    may carry several keys — LSH bands, multi-key schemes); ``gold`` has
    one row per record with its true cluster id. Returns ONE row:

    - ``n_records``, ``n_blocks``, ``n_candidate_pairs`` (distinct pairs
      co-blocked by >= 1 key), ``n_gold_pairs`` (sum_g C(|g|,2)),
      ``n_covered_gold_pairs`` (gold pairs that share a block);
    - ``reduction_ratio_micro``  = 1e6 * (1 - cand / C(N,2));
    - ``pairs_completeness_micro`` = 1e6 * covered / gold_pairs;
    - ``pairs_quality_micro``      = 1e6 * covered / cand.

    Scale: the distinct-pair count requires materializing the blocked
    pairs — the SAME join the downstream scorer performs, so measuring
    it costs one extra pass over work the pipeline does anyway; run it
    on `cap_blocks` output (as the pipeline does) so hot keys cannot go
    quadratic. C(N,2) is computed in double (N*(N-1) overflows int64
    past ~4.3e9 records). All ratio outputs are micro-unit integers for
    engine-exact replay.
    """
    g = gold.select(F.col(id_col).alias("rid"), F.col(gold_col).alias("gv"))
    b = blocked.select(F.col(id_col).alias("rid"), "block_key").join(g, "rid")
    a_side = b.select(
        F.col("rid").alias("id_a"), F.col("gv").alias("g_a"), "block_key"
    )
    b_side = b.select(
        F.col("rid").alias("id_b"), F.col("gv").alias("g_b"), "block_key"
    )
    pairs = (
        a_side.join(b_side, "block_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = pairs.agg(
        F.count("*").cast("long").alias("n_candidate_pairs"),
        F.sum((F.col("g_a") == F.col("g_b")).cast("long"))
        .cast("long")
        .alias("n_covered_gold_pairs"),
    )
    rec = g.agg(F.count("*").cast("long").alias("n_records"))
    gold_pairs = (
        g.groupBy("gv")
        .agg(F.count("*").alias("gn"))
        .agg(
            F.sum(F.col("gn") * (F.col("gn") - 1) / 2)
            .cast("long")
            .alias("n_gold_pairs")
        )
    )
    blocks = blocked.agg(
        F.countDistinct("block_key").cast("long").alias("n_blocks")
    )
    s = (
        cand.crossJoin(F.broadcast(rec))
        .crossJoin(F.broadcast(gold_pairs))
        .crossJoin(F.broadcast(blocks))
    )
    total = F.col("n_records").cast("double") * (F.col("n_records") - 1) / 2
    return s.select(
        "n_records",
        "n_blocks",
        "n_candidate_pairs",
        "n_gold_pairs",
        "n_covered_gold_pairs",
        F.round((1 - F.col("n_candidate_pairs") / total) * 1000000)
        .cast("long")
        .alias("reduction_ratio_micro"),
        F.round(
            F.col("n_covered_gold_pairs") / F.col("n_gold_pairs") * 1000000
        )
        .cast("long")
        .alias("pairs_completeness_micro"),
        F.round(
            F.col("n_covered_gold_pairs")
            / F.col("n_candidate_pairs")
            * 1000000
        )
        .cast("long")
        .alias("pairs_quality_micro"),
    )


def _sharded_global_ranks(
    df: DataFrame, key_col, id_col: str, prefix_len: int
) -> DataFrame:
    """Exact global 1-based sort ranks by (key, id) WITHOUT a
    single-partition window: ordered coarse buckets = the key's leading
    ``prefix_len`` chars (prefix order coarsens lexicographic order),
    dictionary-scale bucket counts cumsum'd into offsets (window over
    the tiny aggregate only) and broadcast back, within-bucket
    row_number windows in parallel. -> (rid, _k, _ob, rank);
    prefix_len only changes parallelism, never the ranks. NULL keys
    coalesce to '' (sort first)."""
    from pyspark.sql import Window

    key = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    d = df.select(F.col(id_col).alias("rid"), key.alias("_k")).withColumn(
        "_ob", F.substring("_k", 1, prefix_len)
    )
    counts = d.groupBy("_ob").agg(F.count("*").alias("_c"))
    wb = Window.orderBy("_ob").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(wb), F.lit(0)).cast("long")
    ).select("_ob", "_off")
    wi = Window.partitionBy("_ob").orderBy("_k", "rid")
    return d.join(F.broadcast(offs), "_ob").withColumn(
        "rank", (F.col("_off") + F.row_number().over(wi)).cast("long")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col,
    id_col: str = "record_id",
    window: int = 5,
    prefix_len: int = 2,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995): sort all
    records by a composite key and slide a window of size ``window``;
    records that co-occur in any window position become candidate
    pairs — i.e. every pair whose global sort ranks differ by at most
    ``window - 1``. Complements LSH/dictionary blocking: SNM catches
    near-misses whose keys are CLOSE but not equal (typos at the tail
    of a sort key), at a guaranteed O(n * window) pair budget.

    Scale shape (the whole point of this implementation):

    - A naive global ``row_number`` is a single-partition window — the
      classic scale-killer. The global rank here is SHARDED: ordered
      coarse buckets = the key's leading ``prefix_len`` characters
      (prefix order is a coarsening of lexicographic order, so bucket
      boundaries respect the sort); a dictionary-scale count table is
      cumsum'd into bucket offsets (window over the TINY aggregate) and
      broadcast back; within-bucket ``row_number`` windows run in
      parallel. Output ranks are exact and prefix_len-invariant.
    - The pair join is a BAND self-join on rank blocks of size
      ``window - 1`` (each left row probes its own and the next block —
      an exploded 2-element key), never a cross join; each qualifying
      pair is produced exactly once, so no distinct pass is needed.
    - Skew note: records sharing a full prefix land in one rank
      partition — pick ``prefix_len`` so prefix groups stay small (the
      result is invariant, only parallelism changes).

    Returns (id_a, id_b, rank_a, rank_b) with rank_a < rank_b. NULL
    keys sort first (coalesced to '').
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    s = window - 1
    ranked = _sharded_global_ranks(df, key_col, id_col, prefix_len).withColumn(
        "_b", F.floor((F.col("rank") - 1) / s).cast("long")
    )
    left = ranked.select(
        F.col("rid").alias("id_a"),
        F.col("rank").alias("rank_a"),
        F.explode(F.array(F.col("_b"), F.col("_b") + 1)).alias("_jb"),
    )
    right = ranked.select(
        F.col("rid").alias("id_b"),
        F.col("rank").alias("rank_b"),
        F.col("_b").alias("_jb"),
    )
    return (
        left.join(right, "_jb")
        .filter(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") - F.col("rank_a") <= s)
        )
        .select("id_a", "id_b", "rank_a", "rank_b")
    )


def phonetic_block_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "record_id",
) -> DataFrame:
    """Soundex phonetic blocking over every alphabetic token (Odell &
    Russell 1918; Christen 2012 ch.4): explode tokens, key each by
    :func:`fel_spark.functions.phonetic.soundex_col`, and report per
    phonetic block the token volume, distinct-surface-form count,
    distinct-record count, and the candidate-pair budget n*(n-1)/2 the
    block would feed a pairwise scorer — the ex-ante audit that decides
    whether a phonetic key needs the salt cap before the self-join
    (same role as `key_skew_report` for equi-join keys).

    Scale shape: one map-side explode + ONE hash aggregate keyed by the
    dictionary-scale code; the whole soundex chain is codegen column
    algebra (no UDF).
    """
    from fel_spark.functions.phonetic import soundex_col

    toks = df.select(
        F.col(id_col).alias("rid"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit("[A-Za-z]+"), 0)
        ).alias("tok"),
    )
    coded = toks.withColumn("code", soundex_col(F.col("tok")))
    agg = coded.groupBy("code").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("n_forms"),
        F.countDistinct("rid").alias("n_records"),
    )
    n = F.col("n_records")
    return agg.select(
        "code",
        "n_tokens",
        "n_forms",
        "n_records",
        (n * (n - 1) / 2).cast("long").alias("n_cand_pairs"),
    )


def metablocking_pairs(
    blocked: DataFrame,
    id_col: str = "record_id",
    key_col: str = "block_key",
    purge_above: int | None = None,
) -> DataFrame:
    """Meta-blocking with block purging + weighted edge pruning
    (Papadakis et al. 2011, 2014 — the standard redundancy-aware
    candidate-pair filter for overlapping blocking schemes).

    Records exploded into MULTIPLE blocks produce redundant candidate
    pairs; the co-occurrence structure itself carries signal. Build the
    block graph: edge weight per pair = CBS (number of common blocks)
    and JS (Jaccard of the two records' block-key sets); prune edges
    whose JS falls below the global mean edge weight (WEP). Block
    purging (drop blocks above ``purge_above`` members) runs first —
    oversized blocks are both the scale hazard and the least
    discriminative evidence.

    Scale shape (r6): both edge weights (CBS, JS) depend on a record
    only through its BLOCK-KEY SET, so the whole weight computation runs
    at keyset granularity — records collapse onto their distinct
    keysets (a table that is tiny whenever blocking keys are shared),
    candidate keyset pairs come from a block-key self-join owned by the
    lexicographically least common block (Papadakis et al. 2014 §4
    exactly-once emission), and per-keyset-pair record-pair COUNTS are
    closed-form (n_a*n_b across keysets, n*(n-1)/2 on the diagonal).
    The global WEP mean is then an exact weighted sum over keyset pairs
    — the quadratic record-pair stream is never enumerated for it — and
    only the KEPT keyset pairs expand to record pairs, via two
    broadcast joins. The mean divides the same two exact integer sums
    as the per-edge formulation, so the threshold compare replays
    engine-exact.

    Returns kept edges: (id_a, id_b, common, js_micro).
    """
    b = blocked.select(
        F.col(id_col).alias("rid"), F.col(key_col).alias("bk")
    ).distinct()
    if purge_above is not None:
        sizes = b.groupBy("bk").agg(F.count("*").alias("_n"))
        b = b.join(
            sizes.filter(F.col("_n") <= purge_above).select("bk"), "bk"
        )
    rec2ks = b.groupBy("rid").agg(
        F.sort_array(F.collect_set("bk")).alias("_keys")
    )
    ksu = rec2ks.groupBy("_keys").agg(F.count("*").alias("_n"))
    ke = ksu.select("_keys", "_n", F.explode("_keys").alias("bk"))
    # the keyset table is tiny, so AQE coalesces it to one partition —
    # but the self-join below fans each row out by its block's keysets;
    # spread the probe side (explicit numPartitions defeats coalescing)
    par = max(2 * blocked.sparkSession.sparkContext.defaultParallelism, 8)
    ka = ke.repartition(par).select(
        F.col("_keys").alias("_ka"), F.col("_n").alias("_na"), "bk"
    )
    kb = ke.select(F.col("_keys").alias("_kb"), F.col("_n").alias("_nb"), "bk")
    common_keys = F.array_intersect(F.col("_ka"), F.col("_kb"))
    kp = (
        ka.join(F.broadcast(kb), "bk")
        .filter(F.col("_ka") <= F.col("_kb"))
        # exactly-once: only the least common block emits the keyset pair
        .filter(F.col("bk") == F.array_min(common_keys))
        .select(
            "_ka",
            "_kb",
            F.size(common_keys).cast("long").alias("common"),
            F.size("_ka").alias("nb_a"),
            F.size("_kb").alias("nb_b"),
            # record pairs represented by this keyset pair (id_a < id_b)
            F.when(
                F.col("_ka") == F.col("_kb"),
                F.expr("(_na * (_na - 1)) div 2"),
            )
            .otherwise(F.col("_na") * F.col("_nb"))
            .cast("long")
            .alias("_cnt"),
        )
        .withColumn(
            "js_micro",
            F.round(
                F.col("common")
                / (F.col("nb_a") + F.col("nb_b") - F.col("common"))
                * 1_000_000
            ).cast("long"),
        )
        # consumed twice (the mean and the WEP filter): pin the
        # keyset-pair-scale frame instead of rebuilding the block join
        .localCheckpoint(eager=False)
    )
    # same two exact integer sums as the per-edge mean: sum(js) over all
    # edges == sum(js * cnt) over keyset pairs; count(edges) == sum(cnt).
    # Zero-count pairs (singleton diagonal keysets) are excluded so an
    # edgeless input yields NULL/NULL -> NULL, matching the per-edge
    # mean over an empty frame (not an ANSI 0/0 error).
    mean = kp.filter(F.col("_cnt") > 0).agg(
        (
            F.sum(F.col("js_micro") * F.col("_cnt")).cast("double")
            / F.sum("_cnt")
        ).alias("_thr")
    )
    kept = (
        kp.crossJoin(F.broadcast(mean))
        .filter(F.col("js_micro").cast("double") >= F.col("_thr"))
        .select("_ka", "_kb", "common", "js_micro")
    )
    # the record->keyset table is tiny post-aggregate, so AQE coalesces
    # it to one partition — but each probe row fans out to its keyset's
    # kept partners times their records, so spread the probe side over
    # the session parallelism (explicit numPartitions defeats coalescing)
    par = max(
        2 * rec2ks.sparkSession.sparkContext.defaultParallelism, 8
    )
    ra = rec2ks.repartition(par, "rid").select(
        F.col("rid").alias("_x"), F.col("_keys").alias("_ka")
    )
    rb = rec2ks.select(F.col("rid").alias("_y"), F.col("_keys").alias("_kb"))
    return (
        ra.join(F.broadcast(kept), "_ka")
        .join(F.broadcast(rb), "_kb")
        .filter((F.col("_ka") != F.col("_kb")) | (F.col("_x") < F.col("_y")))
        .select(
            F.least("_x", "_y").alias("id_a"),
            F.greatest("_x", "_y").alias("id_b"),
            F.col("common").cast("long").alias("common"),
            "js_micro",
        )
    )


def blocking_rule_coverage(
    rule_pairs: DataFrame,
    gold: DataFrame,
    rule_order: list[str],
    id_cols: tuple[str, str] = ("id_a", "id_b"),
    rule_col: str = "rule",
    gold_id: str = "record_id",
    gold_col: str = "gold",
) -> DataFrame:
    """Per-blocking-rule recall analysis (Splink's blocking-rule
    coverage chart): which rule finds which true pairs, and what each
    rule adds MARGINALLY over the rules before it — the number that
    decides whether a rule earns its candidate volume.

    For each rule in ``rule_order``: candidate pairs produced, true
    pairs among them (both ids in the same gold cluster), recall vs ALL
    true pairs (sum over gold clusters of n(n-1)/2 — computed from
    cluster sizes, never materialized), marginal true pairs (true pairs
    whose FIRST covering rule, in the declared order, is this one), and
    cumulative recall after this rule.

    Scale shape: distinct (rule, pair) -> two id-keyed gold joins ->
    per-pair first-rule argmin (pair-keyed window over the few covering
    rules) -> rule-keyed aggregates -> a dictionary-scale cumulative
    window + 1-row totals cross join. Micro-unit ratios of exact ints.
    """
    from pyspark.sql import Window

    ia, ib = id_cols
    spark = rule_pairs.sparkSession
    prio = F.broadcast(
        spark.createDataFrame(
            [(r, i) for i, r in enumerate(rule_order)],
            f"{rule_col} string, _prio int",
        )
    )
    rp = rule_pairs.select(ia, ib, rule_col).distinct().join(prio, rule_col)
    ga = gold.select(
        F.col(gold_id).alias(ia), F.col(gold_col).alias("_g_a")
    )
    gb = gold.select(
        F.col(gold_id).alias(ib), F.col(gold_col).alias("_g_b")
    )
    labeled = (
        rp.join(ga, ia)
        .join(gb, ib)
        .withColumn(
            "_true", (F.col("_g_a") == F.col("_g_b")).cast("long")
        )
    )
    w = Window.partitionBy(ia, ib).orderBy("_prio")
    first = labeled.withColumn(
        "_is_first", (F.row_number().over(w) == 1).cast("long")
    )
    per_rule = first.groupBy(rule_col, "_prio").agg(
        F.count("*").alias("n_pairs"),
        F.sum("_true").cast("long").alias("n_true_pairs"),
        F.sum(F.col("_true") * F.col("_is_first"))
        .cast("long")
        .alias("marginal_true_pairs"),
    )
    total = gold.groupBy(gold_col).agg(F.count("*").alias("_n")).agg(
        F.sum(F.col("_n") * (F.col("_n") - 1) / 2)
        .cast("long")
        .alias("total_true")
    )
    wc = Window.orderBy("_prio").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_rule.crossJoin(F.broadcast(total))
        .withColumn(
            "cum_true", F.sum("marginal_true_pairs").over(wc).cast("long")
        )
        .select(
            rule_col,
            "n_pairs",
            "n_true_pairs",
            "marginal_true_pairs",
            # all-singleton gold (no true pairs anywhere): recall := 0
            F.round(
                F.when(F.col("total_true") == 0, F.lit(0.0)).otherwise(
                    F.col("n_true_pairs") / F.col("total_true")
                )
                * 1_000_000
            )
            .cast("long")
            .alias("recall_micro"),
            F.round(
                F.when(F.col("total_true") == 0, F.lit(0.0)).otherwise(
                    F.col("cum_true") / F.col("total_true")
                )
                * 1_000_000
            )
            .cast("long")
            .alias("cum_recall_micro"),
        )
    )


def suffix_block_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str = "record_id",
    min_suffix_len: int = 4,
    max_key_len: int = 20,
    max_block: int = 50,
) -> DataFrame:
    """Suffix-array blocking (Aizawa & Oyama 2005, "A fast linkage
    detection scheme for multi-source information integration";
    Christen 2012 ch.4.5): every suffix of the (lowercased, truncated)
    blocking key with length >= ``min_suffix_len`` becomes a block key,
    so records whose keys differ only in a leading corruption — the
    failure mode that defeats prefix/exact blocking and SNM sort keys —
    still share all their tail suffixes. Complements the phonetic and
    LSH families: suffix blocks are exact on the tail, phonetics are
    fuzzy on the head.

    Scale shape:

    - The suffix fan-out is bounded up front by ``max_key_len`` (each
      record emits at most ``max_key_len - min_suffix_len + 1`` block
      memberships — a constant, never O(|text|)).
    - Block sizes are counted in one hash aggregate; blocks larger than
      ``max_block`` (stopword-like common tails — quadratic traps) and
      singletons are dropped BEFORE the self-join, so the pair stage is
      bounded by ``max_block`` per block. The size filter joins back on
      the suffix key (vocabulary-scale table — deliberately NOT
      broadcast-hinted, the TF-IDF lesson: AQE decides).
    - A pair co-occurring in several surviving suffix blocks is emitted
      once, with its co-occurrence count kept as ``n_shared`` (free
      meta-blocking evidence: more shared suffixes = longer exact tail
      agreement) — the dedup is the same hash aggregate that computes
      it, not an extra distinct pass.

    Returns (id_a, id_b, n_shared) with id_a < id_b.
    """
    if min_suffix_len < 1 or max_key_len < min_suffix_len:
        raise ValueError("need 1 <= min_suffix_len <= max_key_len")
    key = F.substring(
        F.lower(F.coalesce(F.col(key_col).cast("string"), F.lit(""))),
        1,
        max_key_len,
    )
    d = df.select(F.col(id_col).alias("rid"), key.alias("_k"))
    n = min_suffix_len
    sufs = d.filter(F.length("_k") >= n).select(
        "rid",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(_k) - {n} + 1),"
                " i -> substring(_k, i))"
            )
        ).alias("suffix"),
    )
    sizes = (
        sufs.groupBy("suffix")
        .agg(F.count("*").alias("_c"))
        .filter((F.col("_c") >= 2) & (F.col("_c") <= max_block))
        .select("suffix")
    )
    kept = sufs.join(sizes, "suffix")
    left = kept.select("suffix", F.col("rid").alias("id_a"))
    right = kept.select("suffix", F.col("rid").alias("id_b"))
    return (
        left.join(right, "suffix")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def dynamic_block_assign(
    df: DataFrame,
    key_cols: list[str],
    id_col: str = "record_id",
    max_block: int = 100,
) -> DataFrame:
    """Dynamic hierarchical blocking (McNeill, Kardes & Borthwick 2012,
    "Dynamic Record Blocking: Efficient Linking of Massive Databases in
    MapReduce"): block first on ``key_cols[0]``; any block larger than
    ``max_block`` is split by appending the next key, recursively. Each
    record lands in the SHALLOWEST prefix block of size <= ``max_block``
    — hot coarse keys (the quadratic traps) automatically refine, rare
    keys stay coarse (maximum recall). Records whose block is still
    oversized at the deepest level are dropped (the lossy residue the
    salting path handles; audit it via the ``level`` column histogram —
    dropped records simply don't appear).

    Scale shape:

    - ALL level counts come from ONE shuffle: a ``rollup`` over the
      sentinel-coalesced keys (grouping_id distinguishes rollup nulls
      from data nulls), instead of len(key_cols) separate aggregations.
    - Assignment is ONE join: records explode to len(key_cols) prefix
      memberships (a bounded constant), join the vocabulary-scale
      count table on the prefix string (deliberately not
      broadcast-hinted — AQE decides), then one min-level aggregate.
    - No iteration over the data; the "recursion" is entirely in the
      prefix lattice.

    Returns (<id_col>, level, block_key): level = 1-based prefix depth,
    block_key = '\\x1f'-joined key values at that depth.
    """
    if not key_cols:
        raise ValueError("need at least one key column")
    sep = "\x1f"
    nkeys = len(key_cols)
    sent = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")).alias(f"_k{i}")
        for i, c in enumerate(key_cols)
    ]
    d = df.select(F.col(id_col).alias("_rid"), *sent)
    kcols = [f"_k{i}" for i in range(nkeys)]
    # one rollup pass: grouping_id bit i set => _k{i} was aggregated
    # away; a depth-l prefix row has exactly the trailing bits set
    gid_for = lambda lvl: (1 << (nkeys - lvl)) - 1
    counts = (
        d.rollup(*kcols)
        .agg(F.count("*").alias("_c"), F.grouping_id().alias("_gid"))
        .filter(F.col("_gid").isin([gid_for(l) for l in range(1, nkeys + 1)]))
    )
    lvl_expr = F.lit(nkeys)
    for l in range(nkeys, 0, -1):
        lvl_expr = F.when(F.col("_gid") == gid_for(l), F.lit(l)).otherwise(
            lvl_expr
        )
    counts = counts.select(
        F.concat_ws(
            sep, *[F.coalesce(F.col(c), F.lit("")) for c in kcols]
        ).alias("_pfx"),
        lvl_expr.alias("level"),
        "_c",
    ).withColumn(
        "_pfx", F.concat(F.col("level").cast("string"), F.lit(sep), F.col("_pfx"))
    )
    memb = d.select(
        "_rid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(l).alias("level"),
                        F.concat(
                            F.lit(f"{l}{sep}"),
                            F.concat_ws(sep, *kcols[:l]),
                            # pad to full width like the rollup row
                            F.lit(sep * (nkeys - l)),
                        ).alias("_pfx"),
                        F.concat_ws(sep, *kcols[:l]).alias("block_key"),
                    )
                    for l in range(1, nkeys + 1)
                ]
            )
        ).alias("m"),
    ).select("_rid", "m.level", "m._pfx", "m.block_key")
    fits = memb.join(counts.filter(F.col("_c") <= max_block), ["_pfx", "level"])
    best = fits.groupBy("_rid").agg(F.min("level").alias("level"))
    return (
        fits.join(best, ["_rid", "level"])
        .select(F.col("_rid").alias(id_col), "level", "block_key")
    )


def adaptive_sorted_blocks(
    df: DataFrame,
    key_col,
    id_col: str = "record_id",
    min_sim_micro: int = 800_000,
    prefix_len: int = 2,
) -> DataFrame:
    """Adaptive sorted-neighborhood blocking (Yan, Lee, Kan & Giles,
    "Adaptive sorted neighborhood methods for efficient record
    linkage", JCDL 2007): where classic SNM slides a FIXED window over
    the sort order, the adaptive variant cuts block boundaries where
    the sorted keys themselves stop being similar — a block is a
    maximal run of consecutive records whose ADJACENT sort-key
    Jaro-Winkler stays >= ``min_sim_micro``. Dense key regions (many
    variants of one name) become one block regardless of size; sparse
    regions produce singletons instead of wasting the fixed window's
    pair budget on unrelated neighbors.

    Output: one row per record — (``id``, ``rank``, ``block_id``,
    ``is_start``) with rank the exact global (key, id) sort rank,
    block_id the rank of the block's first record, is_start 1 on block
    openers (rank 1, or adjacent-key similarity below threshold).

    Scale: the global rank is the SHARDED construction of
    `sorted_neighborhood_pairs` (no single-partition window); adjacent
    keys meet by a co-partitioned rank join (rank = rank+1), never a
    global lag; the block-opener running max decomposes into
    within-bucket windows + a broadcast cumulative-max over the
    dictionary-scale bucket table — the `splits.py` sharded-cumsum
    discipline. JW is the fuzz-proven batch kernel (bit-exact vs
    DuckDB's native, so the driver oracle replays with lag + running
    max over the same similarity).
    """
    from pyspark.sql import Window

    from fel_spark.functions.sim import jaro_winkler_pudf

    ranked = _sharded_global_ranks(df, key_col, id_col, prefix_len)
    prev = ranked.select(
        (F.col("rank") + 1).alias("rank"), F.col("_k").alias("_k_prev")
    )
    adj = ranked.join(prev, "rank", "left")
    jw = F.round(
        jaro_winkler_pudf(F.col("_k_prev"), F.col("_k")) * 1_000_000
    ).cast("long")
    starts = adj.withColumn(
        "_start_rank",
        F.when(
            F.col("_k_prev").isNull() | (jw < F.lit(min_sim_micro)),
            F.col("rank"),
        ),
    )
    # running max of the sparse opener ranks, sharded by prefix bucket
    wi = Window.partitionBy("_ob").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, 0
    )
    within = starts.withColumn("_wmax", F.max("_start_rank").over(wi))
    bmax = within.groupBy("_ob").agg(F.max("_start_rank").alias("_bm"))
    wb = Window.orderBy("_ob").rowsBetween(Window.unboundedPreceding, -1)
    prior = bmax.withColumn("_pmax", F.max("_bm").over(wb)).select(
        "_ob", "_pmax"
    )
    return (
        within.join(F.broadcast(prior), "_ob")
        .select(
            F.col("rid").alias("id"),
            "rank",
            F.greatest("_wmax", "_pmax").cast("long").alias("block_id"),
            F.when(F.col("_start_rank").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_start"),
        )
    )


def lsh_operating_curve(
    spark,
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    steps: int = 100,
) -> DataFrame:
    """The MinHash-LSH S-curve (Leskovec, Rajaraman & Ullman, MMDS
    ch.3.4): P(candidate | jaccard = s) = 1 - (1 - s^r)^b for b bands
    of r rows — the design-audit table that justifies a banding choice
    BEFORE a corpus-scale run (the threshold where the curve crosses
    1/2 is ~(1/b)^(1/r); recall lost below it and junk admitted above
    it read straight off the table). One row per grid point:
    (``jaccard_4dp``, ``p_candidate_micro``) with the pinned IEEE
    pow chain mirrored by the oracle.

    Scale: a ``steps``-row driver-free table from ``spark.range`` —
    this is an audit artifact, not a data pass."""
    r, b = float(rows_per_band), float(bands)
    s = F.col("id") / F.lit(float(steps))
    return spark.range(0, steps + 1).select(
        F.round(s * 10_000).cast("long").alias("jaccard_4dp"),
        F.round(
            (
                F.lit(1.0)
                - F.pow(F.lit(1.0) - F.pow(s, F.lit(r)), F.lit(b))
            )
            * 1_000_000
        )
        .cast("long")
        .alias("p_candidate_micro"),
    )
