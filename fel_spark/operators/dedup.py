"""Deduplication operators for large-scale training-data pipelines.

Five dedup families over a document table (id + text, optionally an
embedding column), each returning DataFrames a pipeline can act on:

- exact_dedup:            hash-groupBy on normalized text
- minhash_lsh_dedup:      shingle -> minhash -> band -> bucket self-join
- simhash_dedup:          64-bit SimHash + banded Hamming blocking
- ngram_jaccard_dedup:    blocked pairs scored by token n-gram Jaccard
- embedding_cosine_dedup: near-dup pairs by embedding cosine (LSH-bucketed)

Design rules (100 TB posture): no driver-side loops, every signature is
computed by codegen'd expressions, one explode+aggregate pass (map-side
combined), or a single Arrow-batched NumPy pass; exact duplicates collapse
to one representative BEFORE any pair generation; every bucket self-join is
routed through blocking.cap_blocks (hot buckets salt-split at
DEDUP_MAX_BLOCK rows); heavy payloads (gram arrays, vectors) attach to
pairs by id-join after pair dedup instead of riding the band-explode
shuffle — except single-key vector blocking (semantic_dedup), where each
vector lives in exactly ONE block and `_blocked_cosine_edges` shuffles
vectors once and verifies each capped chunk with one bounded GEMM;
clusters come from the shared connected-components operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from fel_spark.functions.hashing import lsh_band_keys, minhash_signatures_df
from fel_spark.functions.sim import array_jaccard
from fel_spark.functions.text import normalize_fast, normalize_tokens, token_ngrams
from fel_spark.operators.blocking import cap_blocks
from fel_spark.operators.cluster import connected_components

DEDUP_MAX_BLOCK = 500


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, canonical_id, dup_count): canonical = min id per
    normalized-text group. One hash-aggregate, no self-join."""
    tn = docs.select(F.col(id_col), normalize_fast(text_col).alias("_tn"))
    groups = tn.groupBy("_tn").agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("dup_count")
    )
    return (
        tn.join(groups, "_tn")
        .select(id_col, "canonical_id", "dup_count")
    )


def _pairs_from_blocks(
    blocked: DataFrame,
    id_col: str,
    carry: list[str],
    max_block: int | None = DEDUP_MAX_BLOCK,
) -> DataFrame:
    """Bucket self-join with hot-bucket salting.

    A corpus with k identical boilerplate docs puts all k in one band
    bucket; an uncapped self-join is O(k^2) pairs. Blocks above
    ``max_block`` rows are salt-split (blocking.cap_blocks) — intra-block
    pairs across salt shards are lost by construction, but exact-dup runs
    collapse through exact_dedup first and transitive closure reconnects
    the rest (same mitigation as the ER path, blocking.py:59-81).
    ``max_block=None`` disables the cap — the oracle-exact replay hook
    (an uncapped SQL collision join then matches bit-for-bit), same
    convention as containment_pairs; never use it at corpus scale.
    """
    # FOUR consumers read this subtree (cap_blocks' size agg, its salt
    # join, and both self-join sides); without a persist the (expensive)
    # signature computation upstream re-evaluates per consumer — measured
    # 2.3x on the bench query. MEMORY_AND_DISK: spills, LRU-evicted.
    blocked = blocked.persist()
    renamed = blocked.withColumnRenamed("bk", "block_key")
    capped = (
        renamed
        if max_block is None
        else cap_blocks(renamed, max_block=max_block, salt_col=id_col)
    )
    a = capped.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
        "block_key",
    )
    b = capped.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in carry],
        "block_key",
    )
    return (
        a.join(b, "block_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def _blocked_cosine_edges(
    blocked: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    max_block: int | None = DEDUP_MAX_BLOCK,
) -> DataFrame:
    """Verified cosine edges from single-key vector blocks, one BLAS matmul
    per salt-capped chunk -> (src string, dst string).

    For SINGLE-key blocking (each vector in exactly one block, e.g. a
    k-means cell) this strictly dominates the ids-only pair-join + per-pair
    HOF cosine: vectors shuffle ONCE (by block key) instead of the O(n^2)
    intra-block pair set riding two id-joins, and the quadratic verify runs
    as one n x n GEMM per chunk instead of interpreted zip_with/aggregate
    per pair. Chunks are bounded at ``max_block`` rows by
    :func:`blocking.cap_blocks` (same salt grouping as `_pairs_from_blocks`,
    so pair semantics are unchanged), so the per-task matrix is at most
    max_block^2 — spill-free by construction. Multi-key (banded) blocking
    should keep the ids-only path: there the explode would shuffle every
    vector bands-times.

    Zero-norm, NULL, and dimension-mismatched vectors score 0.0 against
    everything (matching `sim.cosine_sim`'s OOV guard — the shared
    `similarity._stack` zero-fills them), so malformed rows degrade to
    singletons instead of failing the task. GEMM summation is pairwise
    (BLAS), not the sequential fold of the codegen `cosine_sim` it
    replaces — identical to a few ulps, so thresholds must not be set
    within float-rounding distance of an expected pair's cosine.
    ``max_block=None`` disables the salt cap (oracle-exact replay hook,
    same convention as `_pairs_from_blocks`) — never at corpus scale:
    the cap is also what bounds the per-chunk matrix.
    """
    from fel_spark.operators.similarity import _stack

    # two consumers below the rename (cap_blocks' size agg + its salt
    # join) — persist so an expensive upstream (UDF cell assignment, band
    # keys) evaluates once, mirroring _pairs_from_blocks' contract
    blocked = blocked.persist()
    renamed = blocked.withColumnRenamed("bk", "block_key")
    capped = (
        renamed
        if max_block is None
        else cap_blocks(renamed, max_block=max_block, salt_col=id_col)
    )

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"src": pd.Series(dtype=str), "dst": pd.Series(dtype=str)})
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].astype(str).to_numpy()
        dim = next(
            (len(v) for v in pdf[vec_col] if v is not None and len(v) > 0), 0
        )
        if dim == 0:
            return pd.DataFrame({"src": pd.Series(dtype=str), "dst": pd.Series(dtype=str)})
        V = _stack(pdf[vec_col], dim)
        norms = np.linalg.norm(V, axis=1)
        denom = np.outer(norms, norms)
        G = V @ V.T
        with np.errstate(divide="ignore", invalid="ignore"):
            C = np.where(denom > 0, G / denom, 0.0)
        iu, ju = np.triu_indices(n, k=1)
        keep = C[iu, ju] >= threshold
        return pd.DataFrame({"src": ids[iu[keep]], "dst": ids[ju[keep]]})

    return (
        capped.select(F.col(id_col), F.col(vec_col), "block_key")
        .groupBy("block_key")
        .applyInPandas(emit, "src string, dst string")
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.7,
    max_block: int = DEDUP_MAX_BLOCK,
    hash_fn=None,
) -> DataFrame:
    """MinHash-LSH near-dup clusters.

    shingle (token n-grams) -> minhash signature (explode+min-agg, codegen)
    -> band keys -> bucket self-join -> exact token-Jaccard verification ->
    connected components. Returns (doc_id, cluster_id).
    """
    d = docs.select(F.col(id_col), normalize_fast(text_col).alias("_tn"))
    # dedup-before-pair: collapse exact duplicates to one representative
    # FIRST. Identical texts produce identical signatures, hence identical
    # band keys in EVERY band — an unfixable quadratic hot bucket (salting
    # can't reconnect it: equal docs land in the same salt shard in every
    # band). One hash-agg removes the problem at its root and shrinks the
    # LSH input to distinct texts.
    reps = d.groupBy("_tn").agg(F.min(id_col).alias("_rep"))
    # materialize the token array before shingling (token_ngrams references
    # its input n+2 times; one split per row, not n+2)
    grams = token_ngrams(F.col("_toks"), shingle_n)
    with_g = reps.withColumn("_toks", F.split(F.col("_tn"), " ")).withColumn(
        "_grams", grams
    ).drop("_toks")
    # docs shorter than shingle_n tokens have NO shingles — their minhash
    # signature would be the constant xxhash64(null) vector, putting all of
    # them in one giant bucket. They can't be near-dups by this measure;
    # keep them out of banding (they remain singleton vertices in the CC).
    with_sig = minhash_signatures_df(
        with_g.filter(F.size("_grams") > 0),
        F.col("_grams"),
        ["_rep", "_tn"],
        bands * rows_per_band,
        hash_fn=hash_fn,
    )
    # ids-only through the band explode / cap / self-join shuffle; the
    # normalized text (heavy payload) attaches by id-join AFTER pair dedup
    blocked = with_sig.select(
        "_rep", F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band)).alias("bk")
    )
    pairs = _pairs_from_blocks(blocked, "_rep", [], max_block=max_block)
    pairs = pairs.join(
        reps.select(F.col("_rep").alias("id_a"), F.col("_tn").alias("_tn_a")), "id_a"
    ).join(
        reps.select(F.col("_rep").alias("id_b"), F.col("_tn").alias("_tn_b")), "id_b"
    )
    verified = pairs.withColumn(
        "jaccard", array_jaccard(F.split("_tn_a", " "), F.split("_tn_b", " "))
    ).filter(F.col("jaccard") >= jaccard_threshold)
    edges = verified.select(
        F.col("id_a").cast("string").alias("src"),
        F.col("id_b").cast("string").alias("dst"),
    )
    comp = connected_components(
        edges, vertices=reps.select(F.col("_rep").cast("string").alias("id"))
    )
    # fan the rep's component back out to every doc in its exact-dup group
    return (
        d.join(reps, "_tn")
        .withColumn("_rep_str", F.col("_rep").cast("string"))
        .join(
            comp.select(
                F.col("id").alias("_rep_str"), F.col("component").alias("cluster_id")
            ),
            "_rep_str",
        )
        .select(id_col, "cluster_id")
    )


def _simhash_fold(hashes: pd.Series) -> pd.Series:
    """SimHash fold: array<long> per-token hashes -> 64-bit fingerprint.

    One vectorized NumPy pass per Arrow batch: unpack the 64 bits of every
    token hash, sum +/-1 contributions per row (np.add.reduceat over the
    flattened batch), sign -> bit. Replaces the previous 64-separate-
    interpreted-aggregate-passes column expression (~64x the scan work).
    Bit rule matches the old expression exactly: bit set iff the
    contribution sum is STRICTLY positive (ties -> 0).
    """
    n = len(hashes)
    lens = np.fromiter(
        ((len(h) if h is not None else 0) for h in hashes), dtype=np.int64, count=n
    )
    out = np.zeros(n, dtype=np.uint64)
    nonzero = lens > 0
    if nonzero.any():
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in hashes if h is not None and len(h)]
        ).view(np.uint64)
        # bits: (total_tokens, 64) of {0,1}; contributions are 2*bit - 1.
        # uint8 keeps the peak batch footprint at 64 B/token; the reduceat
        # accumulates in int64 so long rows can't overflow.
        bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.uint8
        )
        offsets = np.zeros(int(nonzero.sum()), dtype=np.int64)
        np.cumsum(lens[nonzero][:-1], out=offsets[1:])
        sums = np.add.reduceat(bits, offsets, axis=0, dtype=np.int64)
        counts = lens[nonzero][:, None]
        contrib = 2 * sums - counts  # sum of +/-1 per bit
        packed = ((contrib > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        out[nonzero] = packed
    return pd.Series(out.view(np.int64))


def simhash_fingerprint(tokens, seed: int = 7171, hash_fn=None):
    """64-bit SimHash of a token array.

    Token hashing stays JVM-side (ONE pass of xxhash64 per token via
    F.transform); the 64-bit fold runs in a single Arrow-batched NumPy UDF.
    Output is bit-identical to the former per-bit aggregate expression.
    (UDF registered lazily — pandas_udf needs an active SparkSession.)
    ``hash_fn(col, seed) -> int64 Column`` swaps the token hash (the
    md5-based variant makes the whole fingerprint DuckDB-reproducible).
    """
    if hash_fn is None:
        hash_fn = lambda c, s: F.xxhash64(c, F.lit(s))  # noqa: E731
    token_hashes = F.transform(tokens, lambda t: hash_fn(t, seed))
    return F.pandas_udf(_simhash_fold, "long")(token_hashes)


def banded_hamming_pairs(
    d: DataFrame,
    id_col: str,
    hash_col: str,
    bands: int | None = None,
    max_hamming: int = 3,
    max_block: int = DEDUP_MAX_BLOCK,
) -> DataFrame:
    """Candidate pairs within ``max_hamming`` of a 64-bit fingerprint
    column, via banded blocking + exact verification.

    Split the fingerprint into ``bands`` disjoint chunks; pairs within
    Hamming distance <= bands-1 must agree on at least one chunk
    (pigeonhole), so ``bands`` defaults to ``max_hamming + 1`` — a
    caller-supplied ``bands`` below that is rejected (it would silently
    miss pairs at distance >= bands that differ in every chunk).
    Pairs verified by exact Hamming distance (JVM bit_count, no Python).
    Returns (id_a, id_b, hamming). Shared kernel for SimHash text dedup
    and pHash image dedup."""
    if bands is None:
        bands = max_hamming + 1
    if bands < max_hamming + 1:
        raise ValueError(
            f"bands={bands} cannot guarantee recall at max_hamming={max_hamming}; "
            f"need bands >= max_hamming + 1 (pigeonhole)"
        )
    if bands > 64:
        raise ValueError(f"bands={bands} > 64 bits")
    chunk_bits = 64 // bands
    # bands=1 (max_hamming=0, exact match) makes the chunk the whole
    # 64-bit word: (1<<64)-1 overflows a JVM long, but -1 IS the all-ones
    # word in two's complement
    mask = F.lit(-1) if chunk_bits >= 64 else F.lit((1 << chunk_bits) - 1)
    keys = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(i)),
                F.shiftright(F.col(hash_col), i * chunk_bits)
                .bitwiseAND(mask)
                .cast("string"),
            )
            for i in range(bands)
        ]
    )
    blocked = d.withColumn("bk", F.explode(keys))
    pairs = _pairs_from_blocks(blocked, id_col, [hash_col], max_block=max_block)
    hamming = F.bit_count(
        F.col(f"{hash_col}_a").bitwiseXOR(F.col(f"{hash_col}_b"))
    )
    return pairs.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def simhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int | None = None,
    max_hamming: int = 3,
    max_block: int = DEDUP_MAX_BLOCK,
    hash_fn=None,
) -> DataFrame:
    """SimHash near-dup candidate pairs (banded Hamming kernel over the
    text fingerprint). Returns (id_a, id_b, hamming)."""
    toks = normalize_tokens(text_col)
    d = docs.select(
        F.col(id_col), simhash_fingerprint(toks, hash_fn=hash_fn).alias("sh")
    )
    return banded_hamming_pairs(
        d, id_col, "sh", bands=bands, max_hamming=max_hamming, max_block=max_block
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 2,
    threshold: float = 0.5,
    bands: int = 6,
    rows_per_band: int = 2,
    max_block: int = DEDUP_MAX_BLOCK,
    hash_fn=None,
) -> DataFrame:
    """Blocked pairwise n-gram Jaccard: (id_a, id_b, jaccard_ngram).

    Blocking via MinHash over the same n-grams guarantees candidate recall
    proportional to Jaccard; the score is then exact on the pair.
    """
    d = docs.select(F.col(id_col), normalize_fast(text_col).alias("_tn"))
    # materialize the token array before shingling (see minhash_lsh_dedup)
    grams_expr = token_ngrams(F.col("_toks"), ngram_n)
    # empty gram arrays (docs shorter than n tokens) would all share the
    # constant null-signature bucket — exclude from banding
    with_g = (
        d.withColumn("_toks", F.split(F.col("_tn"), " "))
        .withColumn("_grams", grams_expr)
        .drop("_toks")
        .filter(F.size("_grams") > 0)
    )
    with_sig = minhash_signatures_df(
        with_g, F.col("_grams"), [id_col], bands * rows_per_band, hash_fn=hash_fn
    )
    blocked = with_sig.withColumn(
        "bk", F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band))
    )
    # pairs carry only ids through the band-explode shuffle; the (heavy)
    # gram arrays attach afterwards by one id-keyed join per side — each
    # doc's grams cross the wire once, not once per band x salt shard
    pairs = _pairs_from_blocks(blocked, id_col, [], max_block=max_block)
    ga = with_g.select(F.col(id_col).alias("id_a"), F.col("_grams").alias("_grams_a"))
    gb = with_g.select(F.col(id_col).alias("id_b"), F.col("_grams").alias("_grams_b"))
    return (
        pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jaccard_ngram", array_jaccard(F.col("_grams_a"), F.col("_grams_b")))
        .filter(F.col("jaccard_ngram") >= threshold)
        .select("id_a", "id_b", "jaccard_ngram")
    )


def jaccard_prefix_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT (100%-recall) Jaccard similarity self-join via prefix filtering
    (PPJoin family): two token SETS with Jaccard >= t must share a token
    within each side's first ``|T| - ceil(t*|T|) + 1`` tokens under a global
    ordering — we order rarest-first (token frequency ascending) so prefix
    blocks stay small. Unlike MinHash-LSH this misses NO qualifying pair,
    which makes it oracle-checkable against an all-pairs SQL join.

    Plan: global token counts (hash agg) -> per-doc frequency-sorted token
    array (one shuffle by id) -> prefix explode -> capped token-block
    self-join -> exact verify. Returns (id_a, id_b, jaccard).
    """
    d = docs.select(
        F.col(id_col), F.array_distinct(normalize_tokens(text_col)).alias("_t")
    ).filter(F.size("_t") > 0)
    tf = d.select(F.explode("_t").alias("_tok")).groupBy("_tok").agg(
        F.count("*").alias("_tc")
    )
    ex = d.select(F.col(id_col), F.explode("_t").alias("_tok")).join(tf, "_tok")
    st = ex.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("_tc", "_tok"))).alias("_st")
    )
    sz = F.size("_st")
    plen = (sz - F.ceil(F.lit(threshold) * sz) + 1).cast("int")
    pref = st.select(
        F.col(id_col),
        F.explode(
            F.transform(F.slice("_st", F.lit(1), plen), lambda x: x["_tok"])
        ).alias("bk"),
    )
    # NO salt cap here: capping drops intra-block pairs, which would break
    # this operator's exactness contract (it exists to be oracle-equal to
    # an all-pairs join). Rarest-first prefixes keep blocks small on
    # natural corpora; collapse exact duplicates upstream (exact_dedup)
    # before running this on adversarial inputs.
    a = pref.select(F.col(id_col).alias("id_a"), "bk")
    b = pref.select(F.col(id_col).alias("id_b"), "bk")
    pairs = (
        a.join(b, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ta = d.select(F.col(id_col).alias("id_a"), F.col("_t").alias("_t_a"))
    tb = d.select(F.col(id_col).alias("id_b"), F.col("_t").alias("_t_b"))
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("jaccard", array_jaccard(F.col("_t_a"), F.col("_t_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_exact_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-recall near-dup clusters: prefix-filter pair join + connected
    components. The value-checkable twin of minhash_lsh_dedup (the SQL
    oracle can replicate both the all-pairs Jaccard graph and the
    transitive closure). Returns (doc_id, cluster_id=min reachable id)."""
    pairs = jaccard_prefix_pairs(docs, id_col, text_col, threshold)
    # keep numeric ids numeric: hash-min over STRING ids would compute the
    # lexicographic minimum ("100" < "99"), not the numeric one the SQL
    # oracle computes
    edges = pairs.select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
    )
    verts = docs.select(F.col(id_col).cast("long").alias("id"))
    comp = connected_components(edges, vertices=verts)
    return comp.select(
        F.col("id").alias(id_col), F.col("component").alias("cluster_id")
    )


def embedding_cosine_pairs(
    docs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 12,
    bands: int = 4,
    seed: int = 1234,
    max_block: int | None = DEDUP_MAX_BLOCK,
    planes=None,
) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH + exact cosine.

    Sign-of-projection bits bucket the vectors (cosine-LSH); candidate pairs
    sharing a band are verified with the exact cosine (column arithmetic).
    Hyperplanes are deterministic (numpy seeded) and inlined as literals;
    ``planes`` pins an explicit (n_planes, dim) matrix instead — the oracle
    replay hook (integer-exact ±1 planes make the band keys
    SQL-reproducible), same contract as ``centroids=`` in semantic_dedup.
    Returns (id_a, id_b, cosine).
    """
    from fel_spark.functions.sim import cosine_sim
    from fel_spark.operators.similarity import _band_keys_expr

    if planes is None:
        first = docs.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first else 0
        planes = np.random.RandomState(seed).randn(n_planes, dim)
    planes = np.asarray(planes, dtype=np.float64)

    d = docs.select(F.col(id_col), F.col(vec_col)).withColumn(
        "bk", F.explode(_band_keys_expr(planes, bands, F.col(vec_col)))
    )
    # ids-only through the band shuffle; vectors attach post-dedup by id
    pairs = _pairs_from_blocks(d, id_col, [], max_block=max_block)
    va = docs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias(f"{vec_col}_a"))
    vb = docs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias(f"{vec_col}_b"))
    cos = cosine_sim(F.col(f"{vec_col}_a"), F.col(f"{vec_col}_b"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# Span-level (substring) dedup — Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better": repeated token windows ACROSS documents
# are the unit of duplication, not whole documents. The suffix-array of the
# paper is replaced by the Spark-shaped equivalent: fixed-width token-window
# fingerprints + one hash aggregate. Exact for spans >= `window` tokens
# (every duplicated span of length L >= window contains a duplicated window,
# so window-level detection has full recall on them).
# ---------------------------------------------------------------------------


def span_shingles(
    docs: DataFrame,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn=None,
) -> DataFrame:
    """-> (id, span_pos, span_fp): one row per ``window``-token shingle of
    the normalized text. ``span_fp`` is xxhash64 of the space-joined shingle
    (codegen'd; ``hash_fn`` swaps in the md5 oracle variant); ``span_pos``
    is the 0-based token offset, kept so callers can locate/excise the span.

    Narrow by construction — (long, int, long) rides every downstream
    shuffle; the text never leaves the scan stage.
    """
    hf = hash_fn or F.xxhash64
    # materialize the token array once per row: token_ngrams references its
    # input n+2 times, and normalize_tokens is regex-backed — feeding it the
    # raw expression would re-run the normalization per reference
    base = docs.select(F.col(id_col), normalize_tokens(text_col).alias("_toks"))
    fps = F.transform(token_ngrams(F.col("_toks"), window), lambda g: hf(g))
    return base.select(
        F.col(id_col),
        F.posexplode(fps).alias("span_pos", "span_fp"),
    )


def duplicated_spans(
    docs: DataFrame,
    window: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn=None,
) -> DataFrame:
    """-> (span_fp, n_docs, n_occurrences): token windows appearing in at
    least ``min_docs`` distinct documents. ONE explode + hash aggregate
    (map-side combined) over the narrow shingle stream — no self-join, no
    pair explosion, so it scales linearly in corpus token count.
    """
    sh = span_shingles(docs, window, id_col, text_col, hash_fn)
    return (
        sh.groupBy("span_fp")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def span_coverage(
    docs: DataFrame,
    window: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn=None,
) -> DataFrame:
    """-> (id, n_spans, n_dup_spans, dup_coverage): per-document fraction of
    token windows that are corpus-duplicated — the decision column a
    span-dedup filter thresholds on (drop / excise docs whose training
    signal is mostly repeated text).

    Shape: the shingle stream is persisted ONCE (two consumers: the hot-span
    aggregate and the coverage join — re-running the normalize+explode over
    the corpus would double the scan). The cache is session-lived because
    the result is returned lazily; callers doing repeated sweeps should
    `spark.catalog.clearCache()` between runs. The join is
    shuffle-on-span_fp of two narrow streams; at 100 TB the hot-span side
    is the smaller by construction (only fps with n_docs >= min_docs
    survive) and AQE picks broadcast when it fits.
    """
    sh = span_shingles(docs, window, id_col, text_col, hash_fn).persist()
    hot = (
        sh.groupBy("span_fp")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("span_fp", F.lit(1).alias("_hot"))
    )
    return (
        sh.join(hot, "span_fp", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.count("_hot").alias("n_dup_spans"),
        )
        .withColumn(
            "dup_coverage", F.col("n_dup_spans") / F.col("n_spans")
        )
    )


def excise_duplicated_spans(
    docs: DataFrame,
    window: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn=None,
) -> DataFrame:
    """-> (id, text_clean, n_cut): remove every duplicated token window
    except one global winner occurrence — the Lee et al. 2022 excision
    semantics (all-but-one), not whole-document dropping.

    Winner election is deterministic and engine-independent: the minimum
    (id, span_pos) struct per fingerprint wins (struct ordering — works for
    numeric AND string ids, no packed-key overflow). Losing occurrences'
    token positions are cut, EXCEPT positions covered by a winner
    occurrence in the same document: overlapping self-repeats (e.g. a
    run of identical tokens) would otherwise let one window's loser cut
    destroy another window's winner, leaving no intact copy anywhere.
    The cleaned text is rebuilt from the surviving tokens in order;
    ``n_cut`` = distinct cut positions (audit column).

    Scale shape: the shingle stream is narrow (id, pos, fp) and persisted
    for its two consumers (hot aggregate + occurrence join) — the cache is
    session-lived because the result is returned lazily; callers doing
    threshold sweeps should `spark.catalog.clearCache()` between runs.
    Losers explode to at most window * occurrences cut positions, grouped
    back to one bounded array per document; the text rebuild is row-local
    array arithmetic. No pair explosion anywhere.
    """
    sh = span_shingles(docs, window, id_col, text_col, hash_fn).persist()
    hot = (
        sh.groupBy("span_fp")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("span_fp")
    )
    occ = sh.join(hot, "span_fp").select(
        id_col,
        "span_pos",
        "span_fp",
        F.struct(F.col(id_col).alias("i"), F.col("span_pos").alias("p")).alias("k"),
    )
    win = occ.groupBy("span_fp").agg(F.min("k").alias("wk"))
    joined = occ.join(win, "span_fp")
    positions = F.explode(
        F.sequence(F.col("span_pos"), F.col("span_pos") + (window - 1))
    ).alias("cut_pos")
    # no distinct() on either cover: the left_anti join is insensitive to
    # duplicate keys and collect_set dedups surviving positions — a hash
    # aggregate over the widest intermediate would be pure extra work
    loser_cover = joined.filter(F.col("k") != F.col("wk")).select(
        F.col(id_col), positions
    )
    win_cover = joined.filter(F.col("k") == F.col("wk")).select(
        F.col(id_col), positions
    )
    cuts = (
        loser_cover.join(win_cover, [id_col, "cut_pos"], "left_anti")
        .groupBy(id_col)
        .agg(F.collect_set("cut_pos").alias("cuts"))
    )
    toks = normalize_tokens(text_col)
    d = docs.select(F.col(id_col), toks.alias("_ts")).join(cuts, id_col, "left")
    cuts_arr = F.coalesce(F.col("cuts"), F.array().cast("array<int>"))
    # NB: the two-parameter transform lambda receives the array INDEX as
    # its second argument — exactly what position filtering needs here.
    indexed = F.transform(
        F.col("_ts"), lambda t, i: F.struct(i.alias("i"), t.alias("t"))
    )
    kept = F.filter(indexed, lambda s: ~F.array_contains(cuts_arr, s["i"]))
    return d.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias("text_clean"),
        F.size(cuts_arr).alias("n_cut"),
    )


def containment_pairs(
    docs: DataFrame,
    window: int = 5,
    min_containment: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn=None,
    max_block: int | None = DEDUP_MAX_BLOCK,
) -> DataFrame:
    """-> (id_a, id_b, inter, n_a, n_b, cont_a4, cont_b4): near-containment
    pairs — one document's shingle set mostly inside another's. The case
    symmetric Jaccard dedup misses by construction: a short document quoted
    verbatim inside a much longer one has tiny Jaccard but containment ~1.

    Candidate generation is the PPJoin prefix filter in its containment
    form: the contained-candidate side keys on its floor((1-t)*n)+1
    globally-RAREST shingles (rarity rank ties broken by fingerprint —
    deterministic, engine-independent), probed against the other side's
    FULL shingle stream. If cont(A->B) >= t then at most (1-t)*|A| of A's
    shingles are outside B, so at least one prefix shingle of A is in B —
    recall is EXACT at the threshold, not heuristic. Keying both sides on
    their own rarest (the symmetric shortcut) would never match a quote
    against its host document, since the host's rarest shingles are its
    unique ones. ``cont_*4`` = floor(containment * 10000).

    Scale shape: distinct shingles only (set semantics), ids+fp through
    every shuffle, one global count aggregate (map-side combined), a
    window over per-doc shingles for the rarity prefix, and a salt-capped
    (``max_block``; pass None for oracle-exact replay) prefix-to-stream
    join keyed on RARE fingerprints (fan-out per key = its global count,
    small by construction of the rarity ordering) — never an all-pairs
    product. Shingle sets attach by id-join after pair dedup.
    """
    sh = (
        span_shingles(docs, window, id_col, text_col, hash_fn)
        .select(id_col, "span_fp")
        .distinct()
        .persist()
    )
    cnt = sh.groupBy("span_fp").agg(F.count("*").alias("_c"))
    from pyspark.sql import Window as W

    wdoc = W.partitionBy(id_col)
    rk = (
        sh.join(cnt, "span_fp")
        .withColumn("_n", F.count("*").over(wdoc))
        .withColumn(
            "_r",
            F.row_number().over(wdoc.orderBy(F.col("_c"), F.col("span_fp"))),
        )
        .filter(
            F.col("_r")
            <= F.floor(F.lit(1.0 - min_containment) * F.col("_n")) + 1
        )
        .select(id_col, "span_fp")
    )
    if max_block is not None:
        # boundedness: drop keys whose global doc count exceeds max_block.
        # Salting can't cap a two-sided key join (each side would salt on
        # its own size profile and the keys stop matching); a fingerprint
        # in > max_block documents carries no containment signal anyway,
        # and dropping it bounds per-key join fan-out at max_block probe
        # rows (quantify the loss like the other capped ops if needed).
        rk = rk.join(
            cnt.filter(F.col("_c") <= max_block).select("span_fp"),
            "span_fp",
            "left_semi",
        )
    probe = sh
    a = rk.select(F.col(id_col).alias("id_a"), F.col("span_fp").alias("block_key"))
    b = probe.select(F.col(id_col).alias("id_b"), F.col("span_fp").alias("block_key"))
    pairs = (
        a.join(b, "block_key")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    gs = sh.groupBy(id_col).agg(
        F.collect_set("span_fp").alias("_fps"), F.count("*").alias("_n")
    )
    scored = (
        pairs.join(
            gs.select(
                F.col(id_col).alias("id_a"),
                F.col("_fps").alias("_fa"),
                F.col("_n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            gs.select(
                F.col(id_col).alias("id_b"),
                F.col("_fps").alias("_fb"),
                F.col("_n").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect("_fa", "_fb")))
    )
    cont_a = F.col("inter") / F.col("n_a")
    cont_b = F.col("inter") / F.col("n_b")
    return (
        scored.filter(F.greatest(cont_a, cont_b) >= min_containment)
        .select(
            "id_a",
            "id_b",
            "inter",
            "n_a",
            "n_b",
            F.floor(cont_a * 10000).cast("long").alias("cont_a4"),
            F.floor(cont_b * 10000).cast("long").alias("cont_b4"),
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    window: int = 13,
    max_overlap: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    eval_id_col: str | None = None,
    hash_fn=None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """-> (id, n_spans, n_contaminated, cont_4dp, keep): benchmark
    decontamination — flag training documents whose token windows collide
    with an evaluation set (the GPT-3 appendix-C / PaLM rule: any shared
    13-gram marks the document contaminated; ``max_overlap`` relaxes the
    drop to a tolerated contaminated-span fraction).

    ``keep`` is False when the contaminated fraction exceeds
    ``max_overlap`` (default 0.0: one collision drops the doc).
    ``eval_id_col``/``eval_text_col`` accommodate eval frames with a
    different shape (default: same names as the training side). Documents
    shorter than ``window`` tokens produce no shingles and are kept with
    ``n_spans = 0`` — standard n-gram decontamination behavior; pair it
    with a shorter window if short docs matter.

    Scale shape: the eval side reduces to a DISTINCT fingerprint set whose
    size is bounded by the benchmark corpus, not the training corpus —
    megabytes against 100 TB — so it is broadcast (``broadcast_eval=False``
    falls back to a shuffle join for oversized eval sets). The training
    side is one shingle explode + broadcast-probe + hash aggregate
    (map-side combined), then an ids-only left join back onto the corpus
    so zero-shingle documents keep a row. No self-join, no pair explosion;
    cost is linear in corpus token count.
    """
    ev = (
        span_shingles(
            eval_docs, window, eval_id_col or id_col, eval_text_col, hash_fn
        )
        .select("span_fp")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    sh = span_shingles(docs, window, id_col, text_col, hash_fn)
    agg = (
        sh.join(ev, "span_fp", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.count("_hit").alias("n_contaminated"),
        )
    )
    out = docs.select(id_col).join(agg, id_col, "left")
    n_spans = F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans")
    n_cont = F.coalesce(F.col("n_contaminated"), F.lit(0))
    frac = F.when(
        F.coalesce(F.col("n_spans"), F.lit(0)) > 0,
        n_cont / F.col("n_spans"),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col(id_col),
        n_spans,
        n_cont.alias("n_contaminated"),
        F.floor(frac * 10000).cast("long").alias("cont_4dp"),
        (frac <= F.lit(float(max_overlap))).alias("keep"),
    )


def semantic_dedup(
    docs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_cells: int = 16,
    centroids=None,
    kmeans_iters: int = 5,
    seed: int = 99,
    max_block: int = DEDUP_MAX_BLOCK,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-dup removal by k-means
    cell bucketing + within-cell exact cosine + connected components.

    -> (id, sem_cluster_id, cell_id, cent_cos, keep): ``sem_cluster_id`` is
    the numeric min member id of the duplicate component; ``keep`` marks
    the member FARTHEST from its cell centroid (lowest ``cent_cos``, ties
    by id) — the paper's keep-low-similarity rule, which retains the least
    prototypical (most informative) copy. Singletons keep themselves.
    Malformed vectors (NULL, empty, or length != the codebook dimension)
    come back as kept singletons with ``cell_id`` -1 and ``cent_cos`` 0.0
    — never merged with each other, never silently dropped.

    ``centroids`` pins a codebook (oracle replay / cross-run stability);
    None trains Lloyd k-means (`similarity.kmeans_centroids` — executor
    partial sums, only k x dim reaches the driver). An EMPTY codebook
    (pinned empty, or trained from empty input) makes every row an OOV
    singleton — all rows return kept with ``cell_id`` -1.

    Scale shape: exact-identical vectors collapse to one representative
    BEFORE any pair generation (same rationale as minhash_lsh_dedup:
    identical vectors share their single cell key AND their salt shard in
    it, so a hot cell's salt split would otherwise separate them
    unrecoverably — a cell is ONE block key, with no second band to
    reconnect through); cell assignment is ONE Arrow matmul per batch (no
    crossJoin); a cell is a SINGLE block key per vector, so verified edges
    come from `_blocked_cosine_edges` — vectors shuffle once by cell and
    each salt-capped (`max_block`) chunk is scored by one bounded GEMM
    instead of an O(n^2) pair join; the centroid table is k rows,
    broadcast. NEAR-identical
    (non-equal) pairs inside a cell larger than ``max_block`` can still be
    cut by the salt split — quantify with `blocking.capped_block_stats`
    over the cell keys, and size ``n_cells`` ~ sqrt(corpus) (the paper's
    regime) so cells stay at explicit-verify size.
    """
    from fel_spark.functions.sim import cosine_sim
    from fel_spark.operators.similarity import _cell_assign_expr, kmeans_centroids

    d = docs.select(id_col, F.col(vec_col).cast("array<double>").alias(vec_col))
    valid0 = d.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))

    if centroids is None:
        reps0 = (
            valid0.groupBy(vec_col)
            .agg(F.min(id_col).alias("_rep"))
            .select(F.col("_rep").alias(id_col), vec_col)
        )
        centroids = kmeans_centroids(
            reps0, k=n_cells, n_iters=kmeans_iters,
            id_col=id_col, vec_col=vec_col, seed=seed,
        )
    cents = np.asarray(centroids, dtype=np.float64)
    if cents.ndim != 2 or cents.shape[0] == 0:
        # no codebook (empty input trained nothing, or an empty pinned
        # centroids= argument): no cells exist, so EVERY row is an OOV
        # singleton under the malformed-vector contract (cell_id -1, kept,
        # never merged) — rows must come back, not silently vanish
        return d.select(
            F.col(id_col),
            F.col(id_col).alias("sem_cluster_id"),
            F.lit(-1).alias("cell_id"),
            F.lit(0.0).alias("cent_cos"),
            F.lit(True).alias("keep"),
        )
    # malformed rows (NULL, empty, or dimension-mismatched vs the codebook)
    # leave the dedup flow HERE as explicit singletons (cell_id -1,
    # cent_cos 0.0 — the OOV contract): the exact-dup collapse would
    # otherwise merge all NULLs into one bogus cluster, and the member
    # fan-out's vector-equality join would silently drop them. One
    # map-only predicate each side — no extra shuffle.
    dim = int(cents.shape[1])
    good = valid0.filter(F.size(vec_col) == dim)
    bad = d.filter(F.col(vec_col).isNull() | (F.size(vec_col) != dim))
    # exact-duplicate pre-collapse: one representative (min id) per
    # distinct vector; verdicts fan back out to members afterwards
    reps = good.groupBy(vec_col).agg(F.min(id_col).alias("_rep"))
    rep_docs = reps.select(F.col("_rep").alias(id_col), vec_col)
    spark = docs.sparkSession
    cent_df = spark.createDataFrame(
        [(int(i), [float(x) for x in cents[i]]) for i in range(len(cents))],
        "cell_id int, _cv array<double>",
    )
    # three consumers (pair ids, vector attach, member fan-out) — persist
    # so the matmul assignment UDF runs once over the representatives
    assigned = (
        rep_docs
        .withColumn("cell_id", _cell_assign_expr(cents, 1, F.col(vec_col))[0])
        .join(F.broadcast(cent_df), "cell_id")
        .withColumn("cent_cos", cosine_sim(F.col(vec_col), F.col("_cv")))
        .drop("_cv")
        .persist()
    )
    blocked = assigned.select(
        F.col(id_col), F.col(vec_col), F.col("cell_id").cast("string").alias("bk")
    )
    edges = _blocked_cosine_edges(
        blocked, id_col, vec_col, threshold, max_block=max_block
    )
    comp = connected_components(
        edges, vertices=assigned.select(F.col(id_col).cast("string").alias("id"))
    )
    from pyspark.sql import Window as W

    # fan the rep verdict out to every member of its exact-dup group
    # (identical vectors have identical cell_id / cent_cos by construction),
    # then elect ONE keeper per component across ALL members
    members = (
        good.join(reps, vec_col)
        .select(id_col, "_rep")
        .join(
            assigned.select(
                F.col(id_col).alias("_rep"), "cell_id", "cent_cos"
            ),
            "_rep",
        )
        .withColumn("_rep_str", F.col("_rep").cast("string"))
        .join(
            comp.select(F.col("id").alias("_rep_str"), "component"), "_rep_str"
        )
    )
    wc = W.partitionBy("component")
    out = (
        members.withColumn("sem_cluster_id", F.min(id_col).over(wc))
        .withColumn(
            "_rn",
            F.row_number().over(
                wc.orderBy(F.col("cent_cos").asc(), F.col(id_col).asc())
            ),
        )
        .select(
            id_col,
            "sem_cluster_id",
            "cell_id",
            "cent_cos",
            (F.col("_rn") == 1).alias("keep"),
        )
    )
    return out.unionByName(
        bad.select(
            F.col(id_col),
            F.col(id_col).alias("sem_cluster_id"),
            F.lit(-1).alias("cell_id"),
            F.lit(0.0).alias("cent_cos"),
            F.lit(True).alias("keep"),
        )
    )


def decontamination_report(
    docs: DataFrame,
    eval_docs: DataFrame,
    window: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
    hash_fn=None,
) -> DataFrame:
    """-> (eval_id, n_train_docs_hit, n_hit_spans): leak provenance — for
    each evaluation document, how many training documents share at least
    one token window with it and how many distinct leaked windows exist.
    The audit view a decontamination pass publishes next to its drop
    decision (which benchmark items are compromised, and how widely).

    Scale shape: both sides reduce to DISTINCT (id, fp) streams; the join
    is keyed on fingerprints that exist in the (benchmark-bounded) eval
    side, so its fan-out is train-occurrence count per leaked fp — a hash
    aggregate away from the per-eval-doc rollup. No pair explosion.
    """
    ev = (
        span_shingles(eval_docs, window, eval_id_col, eval_text_col, hash_fn)
        .select(F.col(eval_id_col).alias("eval_id"), "span_fp")
        .distinct()
    )
    tr = (
        span_shingles(docs, window, id_col, text_col, hash_fn)
        .select(F.col(id_col).alias("_tid"), "span_fp")
        .distinct()
    )
    return (
        ev.join(tr, "span_fp")
        .groupBy("eval_id")
        .agg(
            F.countDistinct("_tid").alias("n_train_docs_hit"),
            F.countDistinct("span_fp").alias("n_hit_spans"),
        )
    )
