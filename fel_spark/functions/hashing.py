"""Deterministic hashing: uniform pseudo-randoms and MinHash signatures.

The reference compresses its alias dictionary with a minimal perfect hash
(`hash/QuasiSuccinctEntityHash.java:266-267`); we don't replicate the
structure — a broadcast join does the lookup — but we do need deterministic,
seedable hash columns for (a) synthetic data generation and (b) MinHash-LSH
blocking keys. Everything uses `xxhash64`, a native JVM expression, so the
whole signature computation stays inside whole-stage codegen and is
reproducible across runs and parallelism levels (no rand()).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TWO_63 = float(2**63)


def md5_hash60(col: Column, seed: int = 0) -> Column:
    """DuckDB-reproducible 60-bit hash: first 15 hex digits of
    md5('<seed>:' || col) parsed base-16.

    Exists ONLY so oracle-parity query variants can be value-checked against
    ANSI SQL (`CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)` in DuckDB).
    The scale path stays on xxhash64 (codegen'd, no hex round-trip).
    """
    s = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def uniform_hash(col: Column, seed: int) -> Column:
    """Deterministic U[0,1) double derived from xxhash64(col, seed)."""
    h = F.xxhash64(col, F.lit(seed))
    # abs(hash)/2^63 in [0,1); guard Long.MIN_VALUE via pmod.
    return (F.pmod(h, F.lit(2**62)).cast("double") / F.lit(float(2**62)))


def minhash_signature(grams: Column, num_hashes: int, seed: int = 4242) -> Column:
    """MinHash signature: array of ``num_hashes`` min-over-grams xxhash64 values.

    ``grams`` is an array<string> (char n-grams or tokens). Hand-rolled rather
    than MLlib's MinHashLSH: deterministic, no Vector conversion, pure codegen.
    Empty gram arrays yield nulls (callers should filter).
    """
    def _slot(i: int):
        # NB: the transform lambda must take exactly one parameter — a
        # two-parameter lambda would receive the array index as arg 2.
        return F.array_min(
            F.transform(grams, lambda g: F.xxhash64(g, F.lit(seed + i)))
        ).alias(f"mh{i}")

    return F.array(*[_slot(i) for i in range(num_hashes)])


def minhash_signatures_df(
    df,
    grams: Column,
    key_cols: list[str],
    num_hashes: int,
    seed: int = 4242,
    out_col: str = "sig",
    hash_fn=None,
):
    """Scalable MinHash: explode grams once, hash with ``num_hashes``
    codegen'd xxhash64 columns, min-aggregate per key (map-side partial
    aggregation shrinks the shuffle to ``num_hashes`` longs per key).

    Prefer this over :func:`minhash_signature` for large inputs — nested
    higher-order-function lambdas are interpreted (not codegen'd) and the
    expression gets re-evaluated per LSH band.

    Rows with no grams get a signature of nulls (xxhash64(null) = seed hash,
    constant) — filter upstream if that matters.
    """
    from pyspark.sql import functions as F  # local alias for clarity

    if hash_fn is None:
        hash_fn = lambda c, s: F.xxhash64(c, F.lit(s))  # noqa: E731
    g = df.select(*key_cols, F.explode_outer(grams).alias("_gram"))
    aggs = [
        F.min(hash_fn(F.col("_gram"), seed + i)).alias(f"_mh{i}")
        for i in range(num_hashes)
    ]
    sig = g.groupBy(*key_cols).agg(*aggs)
    return sig.select(
        *key_cols,
        F.array(*[F.col(f"_mh{i}") for i in range(num_hashes)]).alias(out_col),
    )


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: array of ``bands`` keys, each hashing ``rows_per_band``
    consecutive signature slots. Two items share a band key iff their
    signatures agree on that whole band → candidate pair.

    Returned as array<string> 'band_idx:xxhash64(band slice)'.
    """
    keys = []
    for b in range(bands):
        sl = F.slice(signature, b * rows_per_band + 1, rows_per_band)
        keys.append(
            F.concat_ws(
                ":", F.lit(str(b)), F.xxhash64(F.concat_ws("_", *[sl[i] for i in range(rows_per_band)]))
            )
        )
    return F.array(*keys)
