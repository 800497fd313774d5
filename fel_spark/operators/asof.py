"""As-of (nearest-timestamp) join: attach to each probe row the latest
reference row at or before its timestamp (or earliest at-or-after, with
``direction='forward'``), per key, with an optional staleness tolerance.

Spark has no native ASOF JOIN; a range-condition join explodes to a
quadratic pair stream. This implementation uses the classic union +
last-non-null carry instead: tag the two inputs, union them, and run ONE
window over (keys, ts) carrying the most recent reference payload forward
— total cost is a single shuffle of probe+reference, no pair blow-up,
whatever the time-range overlap. Reference rows sort before probe rows at
equal timestamps, so the match is inclusive (ts_ref <= ts_probe).

Skew note: parallelism is per key — a pathological single hot key
serializes its window, exactly like sessionization; compose with a
coarse time bucket + boundary handoff if one key dominates a corpus.

The DuckDB oracle for this operator is the native ``ASOF LEFT JOIN``
(`__spark_entry__.queries()['events_asof']`), i.e. the whole derivation is
value-checked against an independent engine's built-in implementation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_cols: Sequence[str] = ("value",),
    direction: str = "backward",
    tolerance_us: int | None = None,
    ref_seq_col: str | None = None,
    out_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every probe row survives; matched reference
    payload lands in ``{out_prefix}{ts_col}`` + ``{out_prefix}{col}`` for
    each value column (NULL when no reference row qualifies).

    ``ref_seq_col`` disambiguates duplicate (keys, ts) reference rows
    deterministically (highest sequence wins) with one reference-side
    aggregation; omit it only when (keys, ts) is already unique.
    ``tolerance_us`` voids matches older (backward) / farther (forward)
    than the given microseconds.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(keys)
    value_cols = list(value_cols)

    if ref_seq_col is not None:
        ref = ref.groupBy(*keys, ts_col).agg(
            *[F.max_by(c, ref_seq_col).alias(c) for c in value_cols]
        )
    payload = F.struct(
        F.col(ts_col).alias("_ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    ref_tagged = ref.select(
        *keys, F.col(ts_col).alias(ts_col), F.lit(0).alias("_tag"), payload.alias("_asof")
    )
    probe_tagged = probe.withColumn("_tag", F.lit(1))
    both = ref_tagged.unionByName(probe_tagged, allowMissingColumns=True)

    ts_order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_asof", ignorenulls=True).over(w)

    out = both.withColumn("_carried", carried).filter(F.col("_tag") == 1)
    match_ts = F.col("_carried._ts")
    if tolerance_us is not None:
        # session tz is pinned UTC (session.py), so the cast to TIMESTAMP
        # is identity on the stored micros for TIMESTAMP_NTZ inputs
        def _us(c):
            return F.unix_micros(c.cast("timestamp"))

        age = (
            _us(F.col(ts_col)) - _us(match_ts)
            if direction == "backward"
            else _us(match_ts) - _us(F.col(ts_col))
        )
        ok = match_ts.isNotNull() & (age <= int(tolerance_us))
    else:
        ok = match_ts.isNotNull()
    cols = [F.col(c) for c in probe.columns]
    cols.append(F.when(ok, match_ts).alias(f"{out_prefix}{ts_col}"))
    for c in value_cols:
        cols.append(F.when(ok, F.col(f"_carried.{c}")).alias(f"{out_prefix}{c}"))
    return out.select(*cols)
