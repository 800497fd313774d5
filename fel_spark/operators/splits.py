"""Deterministic dataset splitting for training pipelines.

A 100 TB corpus is split into train/val/test ONCE, reproducibly, with no
shuffle and no stored assignment table: the split label is a pure function
of the record id, so any job (or any later re-run over a grown corpus) can
recompute membership locally at scan time. `randomSplit` is wrong for this
— it is sampling-based, non-deterministic across partitionings, and cannot
be recomputed from the row alone.

Everything is native column arithmetic (codegen'd): hash -> bucket ->
threshold CASE. No UDF, no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("train", 0.90),
    ("val", 0.05),
    ("test", 0.05),
)


def split_bucket(
    id_col: Column,
    seed: int = 7,
    buckets: int = 10000,
    hash_fn=None,
) -> Column:
    """Deterministic bucket in [0, buckets) from a record id.

    Scale path: xxhash64 (JVM codegen). ``hash_fn`` swaps in the
    DuckDB-reproducible md5 hash for oracle-checked variants. The hash is
    taken over the STRING form of the id so both paths see identical bytes.
    The pmod of a 60/63-bit non-negative hash matches ANSI ``%`` exactly.
    """
    s = id_col.cast("string")
    h = hash_fn(s) if hash_fn is not None else F.xxhash64(s, F.lit(seed))
    return F.pmod(h, F.lit(buckets)).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[tuple[str, float], ...] = DEFAULT_WEIGHTS,
    seed: int = 7,
    buckets: int = 10000,
    hash_fn=None,
) -> DataFrame:
    """Assign each row a split label by hashing its id.

    ``weights`` are (label, fraction) pairs; fractions are converted to
    cumulative integer bucket thresholds (exact integer comparison — no
    float boundary ambiguity between engines). Adds ``split_bucket`` and
    ``split`` columns; everything else passes through untouched, so the
    split composes with any downstream scan filter and Catalyst prunes the
    label computation when unused.
    """
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = split_bucket(F.col(id_col), seed=seed, buckets=buckets, hash_fn=hash_fn)
    out = df.withColumn("split_bucket", b)
    expr: Column | None = None
    cum = 0.0
    prev_thresh = 0
    for label, w in weights:
        cum += w
        thresh = int(round(cum * buckets))
        if thresh <= prev_thresh:
            # a weight below 1/buckets would silently produce an always-
            # empty split at ANY corpus size — surface it instead
            raise ValueError(
                f"split '{label}' (weight {w}) rounds to zero of {buckets} "
                f"buckets; raise the weight or the bucket count"
            )
        prev_thresh = thresh
        cond = F.col("split_bucket") < F.lit(thresh)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    # cum == 1.0 -> last threshold == buckets covers every bucket; the
    # otherwise() is unreachable but keeps the column non-nullable in spirit.
    assert expr is not None
    return out.withColumn("split", expr.otherwise(F.lit(weights[-1][0])))


def split_counts(split_df: DataFrame) -> DataFrame:
    """-> (split, n): the audit row logged next to the split (verifies the
    realized fractions against the requested weights)."""
    return split_df.groupBy("split").agg(F.count("*").alias("n"))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 11,
    buckets: int = 1_000_000,
    hash_fn=None,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the domain-mixing primitive
    (keep 100% of wiki, 10% of crawl, ...). A row is kept iff its id's
    hash bucket falls below the stratum's integer threshold, so membership
    is reproducible from the row alone (re-runs, grown corpora, and audits
    all agree), unlike `sample()` which is seed+partitioning dependent.

    Map-only: the rate lookup is a literal CASE chain (strata counts are
    small — domains, not keys), the hash is codegen'd, and the filter
    pushes down to the scan. No shuffle, no state, no sampling bias across
    partitionings.
    """
    b = split_bucket(F.col(id_col), seed=seed, buckets=buckets, hash_fn=hash_fn)
    thresh: Column | None = None
    for stratum, rate in sorted(rates.items()):
        t = F.lit(int(round(rate * buckets)))
        cond = F.col(stratum_col) == stratum
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    default = F.lit(int(round(default_rate * buckets)))
    thresh = default if thresh is None else thresh.otherwise(default)
    return df.filter(b < thresh)


def budget_sample(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    n_tokens_col: Column | None = None,
    seed: int = 13,
    hash_fn=None,
    order_buckets: int = 4096,
) -> DataFrame:
    """Deterministic token-budget prefix sample: keep documents in hash
    order while the running token total INCLUDING each document stays
    <= ``budget_tokens`` (strict prefix — the first non-fitting document
    terminates the sample; no knapsack skipping, so membership is a pure
    function of (id, corpus) and reproducible at any parallelism).

    Scale shape: a single global ORDER BY would funnel the corpus through
    one window partition, so the cumsum is SHARDED the way pack_sequences
    shards streams — the hash's top bits give ``order_buckets`` ordered
    coarse buckets; per-bucket token sums (one tiny agg, broadcast back)
    provide each bucket's global starting offset, and the within-bucket
    running sum is a window partitioned BY bucket (parallel, each a
    1/``order_buckets`` slice of the corpus).

    Returns the kept rows of ``df`` plus (sample_rank, n_tokens,
    cum_tokens). ``hash_fn(string_col) -> long`` swaps in the
    DuckDB-reproducible md5 hash for oracle-checked variants.
    """
    from pyspark.sql import Window

    from fel_spark.operators.textstats import token_count

    return _budget_prefix(
        df,
        F.lit(int(budget_tokens)),
        id_col=id_col,
        n_tokens_col=n_tokens_col,
        seed=seed,
        hash_fn=hash_fn,
        order_buckets=order_buckets,
        group_cols=(),
    )


def mixture_sample(
    df: DataFrame,
    budgets: dict[str, int],
    domain_col: str = "domain",
    id_col: str = "doc_id",
    n_tokens_col: Column | None = None,
    seed: int = 13,
    hash_fn=None,
    order_buckets: int = 4096,
) -> DataFrame:
    """Domain-mixture sampling: an independent token-budget prefix PER
    DOMAIN (the DoReMi / Pile-style mixture construction: target domain
    weights x total budget -> per-domain token budgets). Domains absent
    from ``budgets`` are dropped. Same strict-prefix determinism and
    sharded-cumsum scale shape as `budget_sample`; cum_tokens counts
    within the row's domain."""
    if not budgets:
        raise ValueError("mixture_sample needs at least one domain budget")
    expr = None
    for dom, b in budgets.items():
        cond = F.col(domain_col).cast("string") == str(dom)
        expr = F.when(cond, F.lit(int(b))) if expr is None else expr.when(cond, F.lit(int(b)))
    budget = expr.otherwise(F.lit(-1))  # unknown domain -> budget -1 -> dropped
    return _budget_prefix(
        df,
        budget,
        id_col=id_col,
        n_tokens_col=n_tokens_col,
        seed=seed,
        hash_fn=hash_fn,
        order_buckets=order_buckets,
        group_cols=(domain_col,),
    )


def _budget_prefix(
    df: DataFrame,
    budget_col: Column,
    id_col: str,
    n_tokens_col: Column | None,
    seed: int,
    hash_fn,
    order_buckets: int,
    group_cols: tuple[str, ...],
) -> DataFrame:
    from pyspark.sql import Window

    from fel_spark.operators.textstats import token_count

    s = F.col(id_col).cast("string")
    h = (
        hash_fn(s)
        if hash_fn is not None
        else F.pmod(F.xxhash64(s, F.lit(seed)), F.lit(2**60))
    )
    ntok = n_tokens_col if n_tokens_col is not None else token_count("text")
    # top bits of the 60-bit rank -> ordered coarse buckets
    span = (2**60) // order_buckets
    d = df.withColumn("sample_rank", h).withColumn("n_tokens", ntok).withColumn(
        "_ob", (F.col("sample_rank") / F.lit(span)).cast("int")
    )
    gc = list(group_cols)
    bsums = d.groupBy(*gc, "_ob").agg(F.sum("n_tokens").alias("_btok"))
    wb = (
        Window.partitionBy(*gc).orderBy("_ob").rowsBetween(Window.unboundedPreceding, -1)
        if gc
        else Window.orderBy("_ob").rowsBetween(Window.unboundedPreceding, -1)
    )
    # the bucket table is <= n_groups * order_buckets rows — the
    # narrow-partition window here is over the TINY aggregate, not the corpus
    boffs = bsums.withColumn(
        "_boff", F.coalesce(F.sum("_btok").over(wb), F.lit(0)).cast("long")
    ).select(*gc, "_ob", "_boff")
    wi = (
        Window.partitionBy(*gc, "_ob")
        .orderBy("sample_rank", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        d.join(F.broadcast(boffs), gc + ["_ob"])
        .withColumn(
            "cum_tokens",
            (F.col("_boff") + F.sum("n_tokens").over(wi)).cast("long"),
        )
        .filter(F.col("cum_tokens") <= budget_col)
        .drop("_ob", "_boff")
    )
    return out


def priority_sample(
    df: DataFrame,
    n: int,
    weight_col: Column | str,
    id_col: str = "doc_id",
    seed: int = 7,
    hash_fn=None,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield, Lund, Thorup 2007): priority = w / u with u a
    deterministic U(0,1] hash of the id; keep the n highest priorities.
    Higher-weight records win proportionally more often, no record twice,
    and membership is a pure function of (id, weight, the other rows'
    priorities) — re-runs and re-partitionings agree exactly.

    Engine-neutral by construction: u = (h + 1) / 2^60 and w / u are
    IEEE core ops (correctly rounded, identical across engines), unlike
    the textbook exponential/pow keys (-ln(u)/w, u^(1/w)) whose libm
    transcendentals differ in the last ulp between runtimes. Ties broken
    by id ASC. ``hash_fn(string_col) -> long in [0, 2^60)`` swaps in the
    DuckDB-reproducible md5 hash for oracle-checked variants.

    Scale: priorities are codegen'd column math. Per-group quotas use a
    group-keyed top-n window. The GLOBAL case never runs a global window
    or sort: ``orderBy().limit(n)`` compiles to TakeOrderedAndProject
    (per-partition heap top-n, driver-side merge of n rows/partition),
    and the rank window then runs over the n surviving rows only.
    """
    from pyspark.sql import Window

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    s = F.col(id_col).cast("string")
    h = (
        hash_fn(s)
        if hash_fn is not None
        else F.pmod(F.xxhash64(s, F.lit(seed)), F.lit(2**60))
    )
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**60))
    d = df.withColumn("priority", w.cast("double") / u)
    gc = list(group_cols)
    if gc:
        win = Window.partitionBy(*gc).orderBy(
            F.col("priority").desc(), F.col(id_col).asc()
        )
        return (
            d.withColumn("sample_rank", F.row_number().over(win).cast("int"))
            .filter(F.col("sample_rank") <= n)
            .drop("priority")
        )
    top = d.orderBy(F.col("priority").desc(), F.col(id_col).asc()).limit(n)
    win = Window.partitionBy().orderBy(
        F.col("priority").desc(), F.col(id_col).asc()
    )
    return top.withColumn(
        "sample_rank", F.row_number().over(win).cast("int")
    ).drop("priority")
