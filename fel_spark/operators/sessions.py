"""Sessionization: split a per-user event/turn stream into sessions on
inactivity gaps.

The reference consumes pre-sessionized query logs (`io/Session.java` holds a
user's consecutive queries; FEL never derives the boundaries itself). At
transcript scale the boundaries must be derived in-engine: one window pass —
lag on the ordered timestamp, mark gap > threshold, running sum of marks —
then a per-(user, session) aggregate. Both steps shuffle on ``user_id`` only,
and the second reuses the first's partitioning, so the whole operator is one
exchange of the input regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

DEFAULT_GAP_SECONDS = 1800


def _micros(ts_col: str) -> F.Column:
    # tables store TIMESTAMP_NTZ; the session timezone is pinned to UTC
    # (session.py), so the cast to TIMESTAMP is identity on the stored
    # micros — same integers DuckDB's epoch_us() sees
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """Assign a per-user session sequence number to every event.

    Timestamps compare in integer microseconds (``unix_micros``) so the
    boundary rule is exact — no float/seconds truncation ambiguity.
    Adds ``session_seq`` (1-based, per user) to the input columns.
    """
    w = W.partitionBy(user_col).orderBy(ts_col, *order_cols)
    us = _micros(ts_col)
    gap = us - F.lag(us).over(w)
    new_sess = (gap.isNull() | (gap > gap_seconds * 1_000_000)).cast("int")
    return events.withColumn(
        "session_seq",
        F.sum(new_sess)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long"),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """Per-session rollup: event count and exact span in microseconds.

    The groupBy key extends the window's partition key, so Catalyst reuses
    the sessionize exchange — one shuffle total (verified in
    tests/test_plan_shapes.py).
    """
    s = sessionize(events, user_col, ts_col, order_cols, gap_seconds)
    us = _micros(ts_col)
    return s.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.max(us) - F.min(us)).alias("span_us"),
    )
