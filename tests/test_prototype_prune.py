"""X161 prototypicality pruning: never-overshoot drop target, monotone
keep set (kept always farther than dropped), zero-drop edge, and the
no-window plan law."""

import pytest
from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.clustering import (
    prototype_prune,
)


def _vecs(spark, n=100):
    # distinct distances: vec i sits at radius i/1000 from the origin
    rows = [(i, [i / 1000.0, 0.0]) for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_never_overshoots_and_monotone(spark):
    out = prototype_prune(_vecs(spark), [[0, 0]], drop_pct=25).collect()
    dropped = [r["sqdist"] for r in out if not r["keep"]]
    kept = [r["sqdist"] for r in out if r["keep"]]
    assert 0 < len(dropped) <= 25          # bucket-granular under-drop
    assert max(dropped) < min(kept)        # strictly the easiest go
    assert len(dropped) + len(kept) == 100


def test_zero_drop_keeps_everything(spark):
    out = prototype_prune(_vecs(spark), [[0, 0]], drop_pct=0).collect()
    assert all(r["keep"] for r in out)


def test_per_cell_thresholds_independent(spark):
    # two tight clusters at different radii around different centroids:
    # each cell prunes against ITS OWN distance scale
    rows = ([(i, [i / 1000.0, 0.0]) for i in range(50)]
            + [(100 + i, [10.0 + i / 10.0, 0.0]) for i in range(50)])
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[0, 0], [10_000_000, 0]]
    out = prototype_prune(df, cents, drop_pct=25).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    assert set(by_cell) == {0, 1}
    for cell, rs in by_cell.items():
        dropped = [r["sqdist"] for r in rs if not r["keep"]]
        kept = [r["sqdist"] for r in rs if r["keep"]]
        assert 0 < len(dropped) <= len(rs) // 4 + 1, cell
        assert max(dropped) < min(kept), cell


def test_requires_centroids(spark):
    with pytest.raises(ValueError):
        prototype_prune(_vecs(spark), [])


def test_plan_no_window(spark):
    plan = (prototype_prune(_vecs(spark), [[0, 0]])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
