"""Temporal joins (functions/temporal.py): as-of join and interval
overlap join — semantics on handcrafted frames (ties, no-match,
bucket-boundary pairs counted exactly once) plus plan shape (asof is
ONE exchange; broadcast overlap join has no shuffle on the fact side).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.temporal import (
    asof_join,
    interval_overlap_join,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _asof_fixture(spark):
    fact = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "f1"),
            (1, _ts("2024-01-01 12:00:00"), "f2"),
            (1, _ts("2024-01-01 09:00:00"), "f0"),  # before any dim
            (2, _ts("2024-01-01 10:30:00"), "g1"),
            (3, _ts("2024-01-01 10:00:00"), "h1"),  # key with no dim rows
        ],
        "user_id long, ts timestamp, tag string",
    )
    dim = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 12:00:00"), 20.0),  # tie with f2
            (2, _ts("2024-01-01 10:30:00"), 30.0),  # tie with g1
        ],
        "user_id long, ts timestamp, v double",
    )
    return fact, dim


def test_asof_join_semantics(spark):
    fact, dim = _asof_fixture(spark)
    out = asof_join(fact, dim, on="user_id", ts="ts", value_cols=["v"])
    rows = {r["tag"]: r for r in out.collect()}
    assert len(rows) == 5  # left join: every fact row survives
    # most recent at-or-before; equal timestamps match (inclusive)
    assert rows["f1"]["v"] == 10.0
    assert rows["f2"]["v"] == 20.0 and rows["f2"]["asof_ts"] == _ts(
        "2024-01-01 12:00:00")
    assert rows["g1"]["v"] == 30.0  # exact-tie inclusive
    # no dim row at or before -> nulls
    assert rows["f0"]["v"] is None and rows["f0"]["asof_ts"] is None
    assert rows["h1"]["v"] is None


def test_asof_join_single_exchange(spark):
    fact, dim = _asof_fixture(spark)
    out = asof_join(fact, dim, on="user_id", ts="ts", value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + per-key window fill: exactly one shuffle, on the key
    assert plan.count("Exchange hashpartitioning") == 1


def _overlap_fixture(spark):
    left = spark.createDataFrame(
        [
            # spans 3 hourly buckets — pairs with r1 must count ONCE
            ("L1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:30:00")),
            ("L2", _ts("2024-01-01 13:00:00"), _ts("2024-01-01 13:10:00")),
            ("L3", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:05:00")),
        ],
        "lid string, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [
            # overlaps L1 across two shared buckets
            ("R1", _ts("2024-01-01 11:00:00"), _ts("2024-01-01 12:00:00")),
            # touches L2 only at the closed-interval endpoint
            ("R2", _ts("2024-01-01 13:10:00"), _ts("2024-01-01 14:00:00")),
            # disjoint from everything
            ("R3", _ts("2024-01-01 05:00:00"), _ts("2024-01-01 05:30:00")),
        ],
        "rid string, r_start timestamp, r_end timestamp",
    )
    return left, right


def test_interval_overlap_join_exactly_once(spark):
    left, right = _overlap_fixture(spark)
    for bcast in (False, True):
        pairs = interval_overlap_join(
            left, right, "l_start", "l_end", "r_start", "r_end",
            bucket_seconds=3600, broadcast_right=bcast)
        got = sorted((r["lid"], r["rid"]) for r in pairs.collect())
        # (L1,R1) shares two buckets but must appear exactly once;
        # (L2,R2) is the closed-endpoint touch; L3/R3 match nothing
        assert got == [("L1", "R1"), ("L2", "R2")], got


def test_interval_overlap_join_broadcast_no_shuffle(spark):
    left, right = _overlap_fixture(spark)
    pairs = interval_overlap_join(
        left, right, "l_start", "l_end", "r_start", "r_end",
        bucket_seconds=3600, broadcast_right=True)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_interval_overlap_join_wide_intervals_small_buckets(spark):
    # stress the dedup rule: intervals covering MANY buckets still pair once
    left, right = _overlap_fixture(spark)
    pairs = interval_overlap_join(
        left, right, "l_start", "l_end", "r_start", "r_end",
        bucket_seconds=60, broadcast_right=False)
    got = sorted((r["lid"], r["rid"]) for r in pairs.collect())
    assert got == [("L1", "R1"), ("L2", "R2")], got


def test_trailing_window_agg_semantics(spark):
    """Hand-computed trailing counts, including equal-timestamp peers
    (RANGE includes order-key peers symmetrically)."""
    from ocr_automation_system_spark.functions.windows import (
        trailing_window_agg,
    )

    rows = [
        (1, 7, _ts("2024-01-01 10:00:00"), 1.0),
        (2, 7, _ts("2024-01-01 10:05:00"), 2.0),
        (3, 7, _ts("2024-01-01 10:05:00"), 4.0),   # tie with event 2
        (4, 7, _ts("2024-01-01 10:16:00"), 8.0),   # 11 min after the tie
        (5, 8, _ts("2024-01-01 10:05:00"), 16.0),  # other user
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    out = {r["event_id"]: r for r in
           trailing_window_agg(ev, trail_seconds=600).collect()}
    assert (out[1]["n_trail"], out[1]["value_trail"]) == (1, 1.0)
    # ties see each other: both 10:05 events count {1, 2, 3}
    assert (out[2]["n_trail"], out[2]["value_trail"]) == (3, 7.0)
    assert (out[3]["n_trail"], out[3]["value_trail"]) == (3, 7.0)
    # 10:16 sees nothing from 10:05 (11 min > 10) -> itself only
    assert (out[4]["n_trail"], out[4]["value_trail"]) == (1, 8.0)
    assert (out[5]["n_trail"], out[5]["value_trail"]) == (1, 16.0)


def test_event_funnel_order_respecting(spark, sf_dir, tmp_path):
    """A click BEFORE the first view must not count as funnel stage 2."""
    import os

    from ocr_automation_system_spark.queries import q_event_funnel

    rows = [
        # user 1: click precedes view -> stage stops at 1 (that click
        # doesn't count), later purchase without a qualifying click
        # doesn't count either
        (1, _ts("2024-01-01 09:00:00"), 1, "click", 1.0, "{}"),
        (2, _ts("2024-01-01 10:00:00"), 1, "view", 1.0, "{}"),
        (3, _ts("2024-01-01 11:00:00"), 1, "purchase", 1.0, "{}"),
        # user 2: full ordered funnel
        (4, _ts("2024-01-01 09:00:00"), 2, "view", 1.0, "{}"),
        (5, _ts("2024-01-01 10:00:00"), 2, "click", 1.0, "{}"),
        (6, _ts("2024-01-01 11:00:00"), 2, "purchase", 1.0, "{}"),
        # user 3: never viewed
        (7, _ts("2024-01-01 09:00:00"), 3, "purchase", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    d = str(tmp_path)
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r["user_id"]: r for r in q_event_funnel(spark, d).collect()}
    assert out[1]["stage_reached"] == 1 and out[1]["t_click"] is None
    assert out[2]["stage_reached"] == 3
    assert out[3]["stage_reached"] == 0 and out[3]["t_purchase"] is None
