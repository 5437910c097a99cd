"""Fuzzy string join (functions/fuzzy.py): recall-losslessness of the
q-gram prefix-filter blocking is THE contract — every test compares
against the quadratic ground truth."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.fuzzy import fuzzy_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _truth(left, right, d):
    return sorted((i, j, _lev(a, b))
                  for i, a in left for j, b in right
                  if _lev(a, b) <= d)


def _run(spark, left, right, d=2, q=2):
    l = spark.createDataFrame(left, "lid long, lname string")
    r = spark.createDataFrame(right, "rid long, rname string")
    out = fuzzy_join(l, r, "lid", "lname", "rid", "rname",
                     max_dist=d, q=q)
    return sorted((x["lid"], x["rid"], x["dist"]) for x in out.collect())


def test_fuzzy_join_adversarial_fixture(spark):
    # empties, 1-char strings (the short leg), exact dups, near-misses
    left = list(enumerate(
        ["cold widget", "small widget", "large bolt", "a", "bc",
         "widget", "x", ""]))
    right = list(enumerate(
        ["cld widget", "smal widget", "large bolt", "ab", "b",
         "widgett", "xy", "q"]))
    assert _run(spark, left, right) == _truth(left, right, 2)


def test_fuzzy_join_seeded_random_parity(spark):
    # small alphabet forces gram collisions and hot grams; md5-seeded
    def mk(n, salt):
        out = []
        for i in range(n):
            h = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
            ln = int(h[:2], 16) % 9  # 0..8 chars, empties included
            s = "".join("abc x"[int(c, 16) % 5] for c in h[2:2 + ln])
            out.append((i, s))
        return out

    left, right = mk(60, "L"), mk(60, "R")
    assert _run(spark, left, right) == _truth(left, right, 2)


def test_fuzzy_join_distance_one_and_q3(spark):
    left = list(enumerate(["paneer", "gst number", "udyam", "ab"]))
    right = list(enumerate(["paner", "gst numbr", "udyam", "ba"]))
    for q in (2, 3):
        assert _run(spark, left, right, d=1, q=q) == _truth(left, right, 1)


def test_fuzzy_join_null_never_matches(spark):
    l = spark.createDataFrame([(0, None), (1, "abc")],
                              "lid long, lname string")
    r = spark.createDataFrame([(0, "abc"), (1, None)],
                              "rid long, rname string")
    out = fuzzy_join(l, r, "lid", "lname", "rid", "rname", max_dist=2)
    assert [(x["lid"], x["rid"]) for x in out.collect()] == [(1, 0)]


def test_fuzzy_join_census_broadcast_plan(spark):
    # the rarity census must reach the gram stream as a broadcast join,
    # and prefix selection must be a rank-limit window (WindowGroupLimit
    # prunes map-side before the shuffle)
    l = spark.createDataFrame([(0, "abcdef")], "lid long, lname string")
    r = spark.createDataFrame([(0, "abcdxf")], "rid long, rname string")
    out = fuzzy_join(l, r, "lid", "lname", "rid", "rname", max_dist=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
