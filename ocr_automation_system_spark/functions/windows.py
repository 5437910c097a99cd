"""Windowed / sessionized aggregation over the ``events`` table.

The reference has no streaming surface (SURVEY.md §2.10); these are the
batch windowed-aggregation shapes whose Structured-Streaming twins live in
``streaming/``. Kept oracle-checkable: tumbling windows are
``date_trunc``-keyed groupBys, sessionization is the classic
gap-and-cumsum window-function idiom (one shuffle on user_id)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling_window_agg(events: DataFrame, every: str = "day") -> DataFrame:
    """Per (window_start, event_type): count + rounded sum(value)."""
    return (
        events.groupBy(
            F.date_trunc(every, "ts").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # Exact decimal summation -> double: deterministic under any
            # partitioning/combine order (plain double sums are not).
            F.sum(F.col("value").cast("decimal(20,8)")).cast("double").alias("total_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``. Returns one row per session:
    (user_id, session_id, n_events, session_start, session_end).

    Plan: one shuffle on user_id; both window functions reuse the same
    partitioning (no second exchange)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Interval arithmetic, not epoch subtraction: TIMESTAMP_NTZ -> LTZ ->
    # long would route through the session timezone, where a DST boundary
    # inside a session shifts the gap by an hour in non-UTC sessions.
    # ts > prev + INTERVAL is calendar-true and timezone-independent —
    # identical to DuckDB's naive-timestamp comparison.
    prev = F.lag(F.col("ts")).over(w)
    is_new = F.when(
        prev.isNull()
        | (F.col("ts") > prev + F.expr(f"INTERVAL {gap_minutes * 60} SECONDS")),
        1).otherwise(0)
    sess = (
        events
        .withColumn("_new", is_new)
        .withColumn("session_id", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(20,8)")).cast("double").alias("session_value"),
        )
    )


def trailing_window_agg(events: DataFrame, trail_seconds: int = 600,
                        key: str = "user_id", ts: str = "ts",
                        value: str = "value") -> DataFrame:
    """Per-row trailing time-window stats: for every event, the count
    and exact value sum of the SAME key's events in the closed interval
    [ts - trail_seconds, ts] — the rate-limiter / burst-detection shape
    (events per user per trailing 10 minutes).

    A RANGE frame over calendar epoch seconds (timezone-independent:
    ``timestamp_diff`` from the NTZ epoch, never a session-zone cast).
    RANGE includes order-key peers, so equal-timestamp events see each
    other symmetrically in both engines — deterministic under ties.
    One shuffle on the key; the frame is evaluated in a single
    streaming pass per partition (Spark's sliding RANGE frame keeps a
    bounded buffer of trail_seconds worth of rows, not the partition).
    The sum folds in DECIMAL(20,8) and rounds once at the end — the
    repo's exact-sum discipline, bit-identical cross-engine."""
    ep = F.timestamp_diff(
        "SECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts).cast("timestamp_ntz"))
    w = (Window.partitionBy(key).orderBy(F.col("_ep"))
         .rangeBetween(-trail_seconds, 0))
    return (
        events.withColumn("_ep", ep)
        .select(
            "event_id", key, ts,
            F.count(F.lit(1)).over(w).alias("n_trail"),
            F.sum(F.col(value).cast("decimal(20,8)")).over(w)
            .cast("double").alias("value_trail"))
    )
