"""Temporal joins Spark lacks as built-ins: as-of join and interval
overlap (range) join, expressed as compositions of existing DataFrame
ops so Catalyst keeps optimizing them (no UDFs, no driver loops).

As-of join
----------
``asof_join`` matches each fact row to the most recent dimension row at
or before its timestamp — the crawl-pipeline shape "join each fetch to
the host policy in force when it happened". The classic scalable
implementation: union the two sides with a side marker, ONE shuffle on
the key, and a running ``last(value, ignorenulls=True)`` window fill;
no range-join blowup, no per-key collect. Skew note: per-key order is
inherent to as-of semantics (the window is per key, sequential), so the
partition unit is the key — with host/user keys the per-key row count
is bounded by crawl politeness, and a pathological key degrades to one
task for THAT key only.

Interval overlap join
---------------------
``interval_overlap_join`` joins two interval tables on
``[start, end]`` overlap. A naive theta-join is a cartesian product;
the scale path bucketizes time into fixed-width buckets, explodes each
interval to the buckets it covers, equi-joins on the bucket key, then
keeps exactly one copy of each overlapping pair (the bucket containing
the later of the two starts — both intervals provably cover it, and
``floor`` monotonicity makes it unique). Shuffle is on the bucket key;
with one side small, broadcast it and there is NO shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(fact: DataFrame, dim: DataFrame, on: str, ts: str,
              value_cols: list[str]) -> DataFrame:
    """Left as-of join: every ``fact`` row, plus ``asof_ts`` and the
    ``value_cols`` of the most recent ``dim`` row with the same ``on``
    key and ``dim.ts <= fact.ts`` (inclusive); nulls when no dim row
    precedes the fact.

    Contract: ``dim`` must be unique per (on, ts) — pre-aggregate
    (e.g. ``max_by``) if it is not; duplicate dim timestamps would make
    the fill order nondeterministic. Fact/dim column names must not
    collide outside (on, ts).

    Plan: unionByName -> one Exchange on ``on`` -> running
    ``last(ignorenulls)`` per window -> filter fact side. Equal
    timestamps sort dim-before-fact (side marker), giving the inclusive
    at-or-before semantics of ANSI/DuckDB ``ASOF JOIN`` with ``>=``."""
    fact_rest = [c for c in fact.columns if c not in (on, ts)]
    dim_ts_type = dim.schema[ts].dataType
    d = dim.select(
        F.col(on), F.col(ts), F.lit(0).alias("_side"),
        F.col(ts).alias("_asof_ts"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(fact.schema[c].dataType).alias(c)
          for c in fact_rest],
    )
    f = fact.select(
        F.col(on), F.col(ts), F.lit(1).alias("_side"),
        F.lit(None).cast(dim_ts_type).alias("_asof_ts"),
        *[F.lit(None).cast(dim.schema[c].dataType).alias(c)
          for c in value_cols],
        *[F.col(c) for c in fact_rest],
    )
    w = (Window.partitionBy(on)
         .orderBy(F.col(ts).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fill_cols = ["_asof_ts"] + list(value_cols)
    filled = d.unionByName(f).select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_fill_{c}")
               for c in fill_cols])
    return (
        filled.filter(F.col("_side") == 1)
        .select(F.col(on), F.col(ts), *fact_rest,
                F.col("_fill__asof_ts").alias("asof_ts"),
                *[F.col(f"_fill_{c}").alias(c) for c in value_cols])
    )


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          bucket_seconds: int = 3600,
                          broadcast_right: bool = False) -> DataFrame:
    """All (left, right) row pairs whose [start, end] timestamp
    intervals overlap (closed intervals: ``l_start <= r_end AND
    r_start <= l_end``), each pair exactly once, as left's columns
    + right's columns. Column names must be disjoint.

    Scale shape: explode each interval to the ``bucket_seconds``-wide
    epoch buckets it covers (choose the width near the typical interval
    length so the fan-out stays ~2 rows per interval), equi-join on the
    bucket, filter the exact overlap, and keep only the bucket of the
    later start — the unique bucket both intervals cover first, so no
    ``distinct`` shuffle is needed. ``broadcast_right`` skips the
    shuffle entirely when the right side is small (dimension windows).
    """
    def epoch_s(col):
        # calendar seconds since the NTZ epoch — timezone-independent
        # (TIMESTAMP_NTZ has no long cast, and unix_timestamp would
        # route through the session timezone)
        return F.timestamp_diff(
            "SECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            F.col(col).cast("timestamp_ntz"))

    def buckets(df, start, end, p):
        b0 = F.floor(epoch_s(start) / bucket_seconds)
        b1 = F.floor(epoch_s(end) / bucket_seconds)
        return (df.withColumn(p + "b0", b0)
                .withColumn("_bucket", F.explode(F.sequence(b0, b1))))

    l = buckets(left, l_start, l_end, "_l")
    r = buckets(right, r_start, r_end, "_r")
    if broadcast_right:
        r = F.broadcast(r)
    return (
        l.join(r, "_bucket")
        .filter((F.col(l_start) <= F.col(r_end))
                & (F.col(r_start) <= F.col(l_end)))
        # floor is monotone, so bucket(max(starts)) == max(start buckets):
        # the first bucket BOTH intervals cover — counted exactly once.
        .filter(F.col("_bucket") == F.greatest("_lb0", "_rb0"))
        .drop("_bucket", "_lb0", "_rb0")
    )
