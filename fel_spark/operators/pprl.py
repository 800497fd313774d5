"""Privacy-preserving record linkage: Bloom-filter bigram encodings.

Schnell, Bachteler & Reiche, "Privacy-preserving record linkage using
Bloom filters" (BMC Medical Informatics 2009): each identifier string is
reduced to its character bigrams, every bigram is hashed by k independent
hash functions into an m-bit Bloom filter, and two encodings are compared
with the Dice coefficient over set bits — similar names yield similar bit
patterns while the raw strings never leave their data custodian. This is
the standard PPRL building block (Christen 2012 ch.8; Vatsalan et al.
2017 survey) and the one piece of the classical linkage stack this engine
was missing: all other comparators here assume plaintext on both sides.

Engine mapping — pure column algebra, zero UDFs:

- A filter is represented as its SORTED ARRAY OF SET BIT POSITIONS
  (array<int>), not a packed bitmask: Dice over bitsets equals Dice over
  position sets, Spark's ``array_intersect``/``size`` stay codegen'd, and
  the representation is replayable in ANSI SQL for the driver oracle.
- The k hash functions are the repo's DuckDB-reproducible
  :func:`fel_spark.functions.hashing.md5_hash60` at seeds
  ``seed .. seed+k-1``, mod m — the same double-hashing-by-seed scheme
  Schnell uses (and the md5 convention every oracle-parity query here
  shares). A production deployment would swap in keyed HMACs per party;
  the column shape is identical.
- Dice is emitted in the repo's 4dp fixed-point convention
  (``floor(x * 10000)`` as BIGINT) so cross-engine comparison is exact.

Scale shape: encoding is map-only over the input; the pair stage is the
same blocked self-join every other comparator rides (bounded by the
blocking stage; BlockSplit available when a block must be enumerated
exhaustively). Bloom arrays are <= m ints per row — m=128..1024 keeps the
shuffle payload within the usual mention-row envelope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from fel_spark.functions.hashing import md5_hash60
from fel_spark.functions.text import char_bigrams

DEFAULT_M = 128
DEFAULT_K = 3
DEFAULT_SEED = 9100


def bloom_positions(
    text: Column,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    seed: int = DEFAULT_SEED,
) -> Column:
    """Sorted distinct bit positions of the m-bit, k-hash Bloom encoding
    of ``text``'s character bigrams (per-word pairs, the repo's shared
    bigram convention — `char_bigrams`)."""
    grams = char_bigrams(text)

    def _hash_fn(i: int):
        # NB: exactly ONE lambda parameter — a two-parameter lambda would
        # receive the array index as arg 2 (same pitfall as
        # hashing.minhash_signature).
        return lambda g: F.pmod(md5_hash60(g, seed + i), F.lit(m))

    per_hash = [F.transform(grams, _hash_fn(i)) for i in range(k)]
    flat = per_hash[0]
    for p in per_hash[1:]:
        flat = F.concat(flat, p)
    return F.array_sort(F.array_distinct(flat)).cast("array<int>")


def bloom_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """(id, bloom) — the encoding each party would publish; map-only."""
    return df.select(
        F.col(id_col),
        bloom_positions(F.col(text_col), m, k, seed).alias("bloom"),
    )


def bloom_dice(a: Column, b: Column) -> Column:
    """Dice over two set-bit position arrays: 2|A∩B| / (|A|+|B|).
    Both-empty pairs score 0 (no evidence), matching the bigram-Dice
    convention elsewhere in the repo."""
    inter = F.size(F.array_intersect(a, b))
    denom = F.size(a) + F.size(b)
    return F.when(denom > 0, 2.0 * inter / denom).otherwise(F.lit(0.0))


def pprl_bloom_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Blocked self-join over Bloom encodings: (id_a, id_b, n_bits_a,
    n_bits_b, n_common, dice_4dp). The join sees ONLY the encodings —
    the plaintext column never crosses the pair stage, which is the PPRL
    contract."""
    enc = df.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_bk"),
        bloom_positions(F.col(text_col), m, k, seed).alias("bloom"),
    )
    a = enc.select(
        F.col("_id").alias(f"{id_col}_a"),
        F.col("bloom").alias("_ba"),
        "_bk",
    )
    b = enc.select(
        F.col("_id").alias(f"{id_col}_b"),
        F.col("bloom").alias("_bb"),
        "_bk",
    )
    pairs = a.join(b, "_bk").filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
    dice = bloom_dice(F.col("_ba"), F.col("_bb"))
    return pairs.select(
        f"{id_col}_a",
        f"{id_col}_b",
        F.size("_ba").cast("int").alias("n_bits_a"),
        F.size("_bb").cast("int").alias("n_bits_b"),
        F.size(F.array_intersect("_ba", "_bb")).cast("int").alias("n_common"),
        F.floor(dice * 10000).cast("long").alias("dice_4dp"),
    )
