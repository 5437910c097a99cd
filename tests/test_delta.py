"""Crawl snapshot delta (functions/delta.py): per-URL status
classification over BINARY payloads and the per-host change-rate rollup.
The cross-engine hash gate is test_entry_contract's registry sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.delta import (
    binary_content_hash, host_change_rates, snapshot_delta,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, html binary")


def test_snapshot_delta_classifies_all_states(spark):
    old = _snap(spark, [
        ("https://a.com/1", b"same"),
        ("https://a.com/2", b"old-body"),
        ("https://a.com/3", b"\x00\xff binary gone"),
    ])
    new = _snap(spark, [
        ("https://a.com/1", b"same"),
        ("https://a.com/2", b"new-body"),
        ("https://a.com/4", b"fresh"),
    ])
    got = {r["url"]: r["status"]
           for r in snapshot_delta(old, new).collect()}
    assert got == {
        "https://a.com/1": "unchanged",
        "https://a.com/2": "changed",
        "https://a.com/3": "removed",
        "https://a.com/4": "added",
    }


def test_binary_hash_distinguishes_non_utf8_payloads(spark):
    """The base64-fold identity must separate payloads that differ only
    in non-UTF8 bytes (where a lossy decode would collide)."""
    df = spark.createDataFrame(
        [(b"\x00\xfe junk",), (b"\x00\xff junk",), (b"\x00\xff junk",)],
        "html binary")
    hashes = [r[0] for r in
              df.select(binary_content_hash(F.col("html"))).collect()]
    assert hashes[1] == hashes[2] and hashes[0] != hashes[1]


def test_host_change_rates_rollup(spark):
    old = _snap(spark, [
        ("https://a.com/1", b"x"), ("https://a.com/2", b"y"),
        ("https://b.com/1", b"z"),
    ])
    new = _snap(spark, [
        ("https://a.com/1", b"x"), ("https://a.com/2", b"Y2"),
        ("https://b.com/9", b"n"),
    ])
    out = {r["host"]: r for r in
           host_change_rates(snapshot_delta(old, new)).collect()}
    a = out["a.com"]
    assert (a["n_added"], a["n_removed"], a["n_changed"],
            a["n_unchanged"]) == (0, 0, 1, 1)
    assert a["change_rate"] == 0.5
    b = out["b.com"]
    # no URL present in both snapshots -> rate defined as 0.0, not NaN
    assert (b["n_added"], b["n_removed"]) == (1, 1)
    assert b["change_rate"] == 0.0


def test_content_drift_grades(spark):
    """identical / cosmetic / drifted grading: unchanged text -> 0 bits;
    a short appended footer flips few bits; a rewrite flips many."""
    from ocr_automation_system_spark.functions.delta import content_drift

    base = " ".join(f"w{i}" for i in range(120))
    old_rows = [("u1", base), ("u2", base), ("u3", base),
                ("u4", None), ("only_old", base)]
    new_rows = [("u1", base),
                ("u2", base + " tiny footer"),
                ("u3", " ".join(f"z{i}" for i in range(120))),
                ("u4", None), ("only_new", base)]
    old = spark.createDataFrame(old_rows, "url string, text string")
    new = spark.createDataFrame(new_rows, "url string, text string")
    got = {r["url"]: r for r in content_drift(old, new).collect()}
    # inner join: singletons don't grade
    assert set(got) == {"u1", "u2", "u3", "u4"}
    assert got["u1"]["drift"] == "identical" and got["u1"]["hamming"] == 0
    assert got["u2"]["drift"] == "cosmetic"
    assert 0 < got["u2"]["hamming"] <= 3
    assert got["u3"]["drift"] == "drifted" and got["u3"]["hamming"] > 10
    # token-less on both sides: canonical all-zero signatures -> identical
    assert got["u4"]["drift"] == "identical"


def test_crawl_schedule_politeness_invariants(spark):
    """X84: per-host slots are 1..n with no gaps or duplicates (no two
    concurrent fetches on one host), highest-priority first, and the
    load profile's wave-0 host count equals the number of hosts."""
    from ocr_automation_system_spark.functions.delta import (
        crawl_schedule,
        schedule_load_profile,
    )

    rows = [(i, None, None, f"h{i % 3}", (i * 13) % 50) for i in range(30)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    sched = crawl_schedule(docs).collect()
    by_host: dict = {}
    for r in sched:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        slots = sorted(x["slot"] for x in rs)
        assert slots == list(range(1, len(rs) + 1)), host
        ordered = sorted(rs, key=lambda x: x["slot"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["fetch_offset_s"] + 1 == b["fetch_offset_s"]
    # priority: slot 1 has the max n_chars of its host
    nch = {r[0]: r[4] for r in rows}
    for host, rs in by_host.items():
        top = min(rs, key=lambda x: x["slot"])
        assert nch[top["doc_id"]] == max(nch[x["doc_id"]] for x in rs)

    prof = schedule_load_profile(crawl_schedule(docs), bucket_s=16)
    w0 = {r["wave"]: r for r in prof.collect()}[0]
    assert w0["hosts_active"] == 3 and w0["fetches"] == 3 * 16 - 18


def test_revisit_stats_buckets_and_alignment(spark):
    """Consecutive-pair semantics on a hand-built 4-snapshot history:
    a url changing every step -> fast, once in three intervals ->
    medium (1/3 >= 1/10, < 1/2), never -> static; non-consecutive
    snapshots (a gap) contribute no interval across the gap; the plan
    has no Window."""
    from ocr_automation_system_spark.functions.delta import revisit_stats

    def h(u, s, v):
        return (f"https://{u}/p", s, v)

    rows = (
        [h("fast.com", s, f"v{s}") for s in range(4)]          # 3/3
        + [h("med.com", 0, "a"), h("med.com", 1, "a"),
           h("med.com", 2, "b"), h("med.com", 3, "b")]          # 1/3
        + [h("static.com", s, "same") for s in range(4)]        # 0/3
        # gap: snaps 0 and 2 only -> no consecutive pair at all
        + [h("gap.com", 0, "x"), h("gap.com", 2, "y")]
    )
    hist = spark.createDataFrame(
        rows, "url string, snap int, content_hash string")
    out = {r["host"]: r for r in revisit_stats(hist).collect()}
    assert set(out) == {"fast.com", "med.com", "static.com"}
    assert (out["fast.com"]["n_intervals"],
            out["fast.com"]["n_changed"],
            out["fast.com"]["revisit_bucket"]) == (3, 3, "fast")
    assert (out["med.com"]["n_changed"],
            out["med.com"]["revisit_bucket"]) == (1, "medium")
    assert out["med.com"]["change_fraction"] == 1 / 3
    assert (out["static.com"]["n_changed"],
            out["static.com"]["revisit_bucket"]) == (0, "static")
    plan = (revisit_stats(hist)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan and "Python" not in plan
