"""Count-Min sketch: mergeable approximate frequency counting.

Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications" (J. Algorithms 2005): a d x w
grid of counters; every key increments one counter per row (row i uses
hash_i), a point query reads the MIN over its d counters — an
overestimate by at most eps * N with probability 1 - delta for
w = ceil(e / eps), d = ceil(ln 1/delta). At 100 TB the sketch replaces
a vocabulary-scale frequency shuffle with a FIXED d*w-cell aggregate:
the map-side combine reduces every partition to at most d*w rows no
matter how many distinct keys flow through (heavy-hitter pre-screens,
approximate TF-adjustment tables for `linkage.tf_adjustments`,
join-skew probes). Sketches of shards ADD cell-wise — the mergeable
property that makes it a one-pass distributed aggregate.

Engine-neutral discipline: row hashes are the md5-prefix 60-bit hash
(the `hashing.md5_hash60` contract, seeded by the grid row) mod w —
no RNG, no JVM-specific hash, so the ENTIRE grid — not a statistical
summary of it — replays bit-for-bit in SQL; the driver oracle checks
true counts, estimates and the CMS >= truth invariant side by side.
Spark's built-in `df.stat.countMinSketch` uses JVM murmur seeds and
would not replay; same operator shape, different hash contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["count_min_cells", "cms_estimates"]


def count_min_cells(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch -> one row per OCCUPIED cell: (``depth_i``,
    ``col``, ``cnt``). ``weight_col`` makes it a weighted sketch
    (default: every row counts 1). Cells absent from the output are zero.

    Scale: one explode by ``depth`` (a small constant) + one hash
    aggregate whose key space is bounded by d*w — the shuffle is the
    GRID size, not the key cardinality."""
    rows = df.select(
        F.col(key_col).cast("string").alias("_k"),
        (F.col(weight_col) if weight_col else F.lit(1))
        .cast("long")
        .alias("_w"),
    ).withColumn("depth_i", F.explode(F.array(*[F.lit(i) for i in range(depth)])))
    return (
        rows.withColumn(
            "col",
            F.pmod(
                F.expr(
                    f"conv(substr(md5(concat(depth_i, ':', _k)), 1, 15), 16, 10)"
                ).cast("long"),
                F.lit(width),
            ).cast("long"),
        )
        .groupBy("depth_i", "col")
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cms_estimates(
    cells: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for every probe key: est = min over the d
    rows of the probed cells (missing cell = 0). -> probes + ``cms_est``
    (always >= the true count of the key under the same weights)."""
    pr = probes.withColumn(
        "depth_i",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])),
    ).withColumn(
        "col",
        F.pmod(
            F.expr(
                f"conv(substr(md5(concat(depth_i, ':', "
                f"cast({key_col} as string))), 1, 15), 16, 10)"
            ).cast("long"),
            F.lit(width),
        ).cast("long"),
    )
    return (
        pr.join(F.broadcast(cells), ["depth_i", "col"], "left")
        .groupBy(*probes.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_est"))
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    b: int = 8,
) -> DataFrame:
    """HyperLogLog registers (Flajolet, Fusy, Gandouet & Meunier, AofA
    2007): hash every key with the md5-prefix 60-bit hash, low ``b``
    bits pick one of m = 2^b registers, and the register keeps the MAX
    of rank = (#leading zero bits of the remaining 60-b bits) + 1 — an
    order-free, duplicate-insensitive, cell-wise-mergeable (max) grid,
    the distinct-counting sibling of :func:`count_min_cells`. The rank
    uses ``length(bin(w))`` — exact integer bit-length in both engines,
    never a float log2. -> (``bucket``, ``rank``) for OCCUPIED
    registers (missing = rank 0).

    Scale: one hash aggregate with at most m groups — approximate
    COUNT(DISTINCT) over a 100 TB corpus for the cost of a 256-row
    shuffle."""
    m = 1 << b
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = F.expr(f"h div {m}")
    rank = F.when(w == 0, F.lit(60 - b + 1)).otherwise(
        F.lit(60 - b) - F.length(F.expr("bin(h div " + str(m) + ")")) + 1
    )
    return (
        df.select(h.alias("h"))
        .select(
            F.pmod(F.col("h"), F.lit(m)).cast("long").alias("bucket"),
            rank.cast("long").alias("rank"),
        )
        .groupBy("bucket")
        .agg(F.max("rank").cast("long").alias("rank"))
    )


def hll_estimate(registers: DataFrame, b: int = 8) -> DataFrame:
    """The HLL cardinality estimate from a register table, with the
    paper's small-range (linear counting) correction. The harmonic sum
    is computed as the EXACT integer ``sum(2^(52 - min(rank, 52)))``
    (missing registers contribute 2^52) — dyadic terms summed in int64,
    so no float-order divergence can split the engines — and only the
    final ``alpha_m * m^2 * 2^52 / S`` (and the ``m * ln(m/V)``
    correction) are pinned IEEE chains. One row: ``m``, ``v_empty``,
    ``s_scaled``, ``est``."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.count("*").cast("long").alias("occ"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(52) - F.least(F.col("rank"), F.lit(52)))
            .cast("long")
        )
        .cast("long")
        .alias("s_occ"),
    )
    v = F.lit(m) - F.col("occ")
    s = (F.col("s_occ") + v * F.lit(1 << 52)).cast("long")
    raw = F.lit(alpha * m * m) * F.lit(float(1 << 52)) / s
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v)),
    ).otherwise(F.round(raw))
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        v.cast("long").alias("v_empty"),
        s.alias("s_scaled"),
        est.cast("long").alias("est"),
    )
