"""Deduplication operators for large-scale training-data pipelines.

Five dedup families over a document table (id + text, optionally an
embedding column), each returning DataFrames a pipeline can act on:

- exact_dedup:            hash-groupBy on normalized text
- minhash_lsh_dedup:      shingle -> minhash -> band -> bucket self-join
- simhash_dedup:          64-bit SimHash + banded Hamming blocking
- ngram_jaccard_dedup:    blocked pairs scored by token n-gram Jaccard
- embedding_cosine_dedup: near-dup pairs by embedding cosine (LSH-bucketed)

Design rules (100 TB posture): no driver-side loops, every signature is
computed by codegen'd expressions or one explode+aggregate pass (map-side
combined), every self-join is blocked and salt-capped, clusters come from
the shared connected-components operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fel_spark.functions.hashing import lsh_band_keys, minhash_signatures_df
from fel_spark.functions.sim import array_jaccard
from fel_spark.functions.text import normalize_fast, normalize_tokens, token_ngrams
from fel_spark.operators.cluster import connected_components


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


def _pairs_from_blocks(blocked: DataFrame, id_col: str, carry: list[str]) -> DataFrame:
    a = blocked.select(
        F.col(id_col).alias("id_a"), *[F.col(c).alias(f"{c}_a") for c in carry], "bk"
    )
    b = blocked.select(
        F.col(id_col).alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in carry], "bk"
    )
    return (
        a.join(b, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """MinHash-LSH near-dup clusters.

    shingle (token n-grams) -> minhash signature (explode+min-agg, codegen)
    -> band keys -> bucket self-join -> exact token-Jaccard verification ->
    connected components. Returns (doc_id, cluster_id).
    """
    d = docs.select(F.col(id_col), normalize_fast(text_col).alias("_tn"))
    grams = token_ngrams(F.split(F.col("_tn"), " "), shingle_n)
    with_sig = minhash_signatures_df(d, grams, [id_col, "_tn"], bands * rows_per_band)
    blocked = with_sig.withColumn(
        "bk", F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band))
    )
    pairs = _pairs_from_blocks(blocked, id_col, ["_tn"])
    verified = pairs.withColumn(
        "jaccard", array_jaccard(F.split("_tn_a", " "), F.split("_tn_b", " "))
    ).filter(F.col("jaccard") >= jaccard_threshold)
    edges = verified.select(
        F.col("id_a").cast("string").alias("src"),
        F.col("id_b").cast("string").alias("dst"),
    )
    comp = connected_components(
        edges, vertices=d.select(F.col(id_col).cast("string").alias("id"))
    )
    return comp.select(
        F.col("id").alias(f"{id_col}_str"), F.col("component").alias("cluster_id")
    ).join(
        d.withColumn(f"{id_col}_str", F.col(id_col).cast("string")).select(
            id_col, f"{id_col}_str"
        ),
        f"{id_col}_str",
    ).select(id_col, "cluster_id")


def simhash_expr(tokens, bits: int = 64, seed: int = 7171):
    """64-bit SimHash of a token array as a native column expression.

    For each bit b: sum over tokens of +/-1 according to bit b of
    xxhash64(token); sign of the sum -> bit. Expressed as an aggregate over
    the token array per bit — stays in codegen, no UDF.
    """
    def bit(b: int):
        contrib = F.aggregate(
            tokens,
            F.lit(0),
            lambda acc, t: acc
            + F.when(
                F.shiftright(F.xxhash64(t, F.lit(seed)), b).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
        return F.when(contrib > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.shiftleft(bit(b), b)
    return out


def simhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup candidate pairs.

    Banded blocking: split the 64-bit fingerprint into ``bands`` 16-bit
    chunks; near-dups within Hamming distance < bands must agree on at least
    one chunk (pigeonhole). Pairs verified by exact Hamming distance.
    Returns (id_a, id_b, hamming).
    """
    toks = normalize_tokens(text_col)
    d = docs.select(F.col(id_col), simhash_expr(toks).alias("sh"))
    chunk_bits = 64 // bands
    mask = (1 << chunk_bits) - 1
    keys = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(i)),
                F.shiftright(F.col("sh"), i * chunk_bits)
                .bitwiseAND(F.lit(mask))
                .cast("string"),
            )
            for i in range(bands)
        ]
    )
    blocked = d.withColumn("bk", F.explode(keys))
    pairs = _pairs_from_blocks(blocked, id_col, ["sh"])
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 2,
    threshold: float = 0.5,
    bands: int = 6,
    rows_per_band: int = 2,
) -> DataFrame:
    """Blocked pairwise n-gram Jaccard: (id_a, id_b, jaccard_ngram).

    Blocking via MinHash over the same n-grams guarantees candidate recall
    proportional to Jaccard; the score is then exact on the pair.
    """
    d = docs.select(F.col(id_col), normalize_fast(text_col).alias("_tn"))
    grams_expr = token_ngrams(F.split(F.col("_tn"), " "), ngram_n)
    with_g = d.withColumn("_grams", grams_expr)
    with_sig = minhash_signatures_df(
        with_g, F.col("_grams"), [id_col, "_grams"], bands * rows_per_band
    )
    blocked = with_sig.withColumn(
        "bk", F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band))
    )
    pairs = _pairs_from_blocks(blocked, id_col, ["_grams"])
    return (
        pairs.withColumn("jaccard_ngram", array_jaccard(F.col("_grams_a"), F.col("_grams_b")))
        .filter(F.col("jaccard_ngram") >= threshold)
        .select("id_a", "id_b", "jaccard_ngram")
    )


def embedding_cosine_pairs(
    docs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 12,
    bands: int = 4,
    seed: int = 1234,
) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH + exact cosine.

    Sign-of-projection bits bucket the vectors (cosine-LSH); candidate pairs
    sharing a band are verified with the exact cosine (column arithmetic).
    Hyperplanes are deterministic (numpy seeded) and inlined as literals.
    Returns (id_a, id_b, cosine).
    """
    import numpy as np

    from fel_spark.functions.sim import cosine_sim

    first = docs.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"]) if first else 0
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)

    def bit(i: int):
        lit_plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj > 0, F.lit(1)).otherwise(F.lit(0))

    bits_per_band = n_planes // bands
    band_keys = []
    for b in range(bands):
        parts = [bit(b * bits_per_band + j).cast("string") for j in range(bits_per_band)]
        band_keys.append(F.concat_ws("", F.lit(str(b) + ":"), *parts))
    d = docs.select(F.col(id_col), F.col(vec_col)).withColumn(
        "bk", F.explode(F.array(*band_keys))
    )
    pairs = _pairs_from_blocks(d, id_col, [vec_col])
    cos = cosine_sim(F.col(f"{vec_col}_a"), F.col(f"{vec_col}_b"))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
