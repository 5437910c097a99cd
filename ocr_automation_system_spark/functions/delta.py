"""Crawl snapshot delta: what changed between two captures of the web.

A recrawling pipeline's first question after ``latest_capture`` picks a
winner per URL is differential: which pages are NEW since the last
snapshot (extract them), which are GONE (tombstone downstream indexes),
which CHANGED (re-extract + invalidate), and which are byte-identical
(skip — at 10^12 documents the unchanged set is the overwhelming
majority and skipping it is the whole economics of incremental crawling).

``snapshot_delta`` is one full-outer join on the URL key over the two
snapshots' (url, content-hash) projections. At production scale both
snapshots live in Iceberg bucketed by url — the join is co-located
(storage-partitioned join, no shuffle); here it is one exchange per
side. ``host_change_rates`` rolls the per-URL statuses up to the host
dimension — one map-side-combined groupBy; the change-rate division is
a single correctly-rounded double op, bit-exact vs the DuckDB twin.

Content identity over arbitrary BINARY payloads is
``md5(base64(html))`` with the base64 folded to one line: Spark's
``base64`` emits MIME \\r\\n chunking while DuckDB's ``to_base64`` does
not, so the Spark side strips CR/LF with ``translate`` before hashing —
same string, same hash, both engines (pinned by the contract gate).

No reference counterpart (the reference rescans its local folder each
run, ``/root/reference/project/main.py``); this tier exists for the
incremental web-corpus maintenance the engine targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binary_content_hash(payload: Column) -> Column:
    """Engine-portable md5 identity for a BINARY column (see module
    docstring for the base64 newline-fold)."""
    return F.md5(F.translate(F.base64(payload), "\r\n", ""))


def url_host(url: Column) -> Column:
    return F.regexp_extract(url, r"^https?://([^/]+)/", 1)


def snapshot_delta(old: DataFrame, new: DataFrame, key_col: str = "url",
                   payload_col: str = "html") -> DataFrame:
    """(url, host, status) for every URL seen in either snapshot, with
    status in {added, removed, changed, unchanged}."""
    a = old.select(F.col(key_col).alias("url"),
                   binary_content_hash(F.col(payload_col)).alias("_h_old"))
    b = new.select(F.col(key_col).alias("url"),
                   binary_content_hash(F.col(payload_col)).alias("_h_new"))
    return (a.join(b, "url", "full_outer")
            .select(
                "url",
                url_host(F.col("url")).alias("host"),
                F.when(F.col("_h_old").isNull(), F.lit("added"))
                .when(F.col("_h_new").isNull(), F.lit("removed"))
                .when(F.col("_h_old") == F.col("_h_new"),
                      F.lit("unchanged"))
                .otherwise(F.lit("changed")).alias("status")))


def host_change_rates(delta: DataFrame) -> DataFrame:
    """Per-host delta rollup: status counts + change_rate =
    changed / (changed + unchanged) over the URLs present in both
    snapshots (0.0 when none are)."""
    def n(status: str) -> Column:
        return F.sum(F.when(F.col("status") == status, 1).otherwise(0))

    counts = delta.groupBy("host").agg(
        n("added").cast("long").alias("n_added"),
        n("removed").cast("long").alias("n_removed"),
        n("changed").cast("long").alias("n_changed"),
        n("unchanged").cast("long").alias("n_unchanged"))
    both = F.col("n_changed") + F.col("n_unchanged")
    return counts.withColumn(
        "change_rate",
        F.when(both > 0,
               F.col("n_changed").cast("double") / both.cast("double"))
        .otherwise(F.lit(0.0)))


def content_drift(old: DataFrame, new: DataFrame, id_col: str = "url",
                  text_col: str = "text",
                  cosmetic_bits: int = 3) -> DataFrame:
    """GRADED change detection between two captures of the same key:
    (key, hamming, drift) with drift in {identical, cosmetic, drifted}.

    ``snapshot_delta``'s byte-hash answer is binary — a copyright-year
    tick and a full rewrite both read "changed". The recrawl scheduler
    needs the grade: 64-bit SimHash Hamming distance between the two
    captures' texts flips ~0-``cosmetic_bits`` bits for chrome/date
    noise (skip re-extraction, keep the old text) and ~half the bits
    for a real rewrite (re-extract + invalidate). Inner join — only
    keys present in both snapshots are gradable (``snapshot_delta``
    already names the added/removed sets).

    Scale shape: one signature table per side (simhash_table's single
    wide map-side-combined aggregate each) + one equi-join on the key;
    the popcount grade is a codegen row expression. At production scale
    the signature column PERSISTS with each snapshot (it is the same
    signature the near-dup tier stores), so per crawl only the join
    runs. Exact integer votes end-to-end — bit-identical cross-engine.
    """
    from .dedup import simhash_table

    def _sig(df, ha, lo):
        # NULL captures sign as '' (the canonical all-zero signature)
        # rather than silently dropping the key from the grade
        src = df.select(F.col(id_col),
                        F.coalesce(F.col(text_col), F.lit(""))
                        .alias(text_col))
        return (simhash_table(src, id_col=id_col, text_col=text_col)
                .select(F.col("doc_id").alias("_k"),
                        F.col("sim_hi").alias(ha),
                        F.col("sim_lo").alias(lo)))

    a = _sig(old, "_hi_a", "_lo_a")
    b = _sig(new, "_hi_b", "_lo_b")
    ham = (F.bit_count(F.col("_hi_a").bitwiseXOR(F.col("_hi_b")))
           + F.bit_count(F.col("_lo_a").bitwiseXOR(F.col("_lo_b"))))
    return (a.join(b, "_k")
            .select(F.col("_k").alias(id_col),
                    ham.cast("int").alias("hamming"),
                    F.when(ham == 0, F.lit("identical"))
                    .when(ham <= cosmetic_bits, F.lit("cosmetic"))
                    .otherwise(F.lit("drifted")).alias("drift")))


def revisit_stats(history: DataFrame, url_col: str = "url",
                  snap_col: str = "snap",
                  hash_col: str = "content_hash") -> DataFrame:
    """Per-host change-frequency estimate from a MULTI-snapshot capture
    history ``(url, snap, content_hash)``: every consecutive-snapshot
    pair of one url is an observation interval, an interval counts as
    changed when its hashes differ — (host, n_intervals, n_changed,
    change_fraction, revisit_bucket).

    This is the sufficient-statistics half of the Cho &
    Garcia-Molina revisit policy (the Poisson rate estimate
    ``-ln((n-X+.5)/(n+.5))`` is a driver-side readout of (n, X) — no
    ``log()`` in the data plane, per the house rational discipline).
    ``revisit_bucket`` classifies by EXACT integer cross-multiplication
    (never a float compare): changed on >= 1/2 of intervals -> 'fast',
    >= 1/10 -> 'medium', > 0 -> 'slow', never -> 'static'.
    ``change_fraction`` is the one correctly-rounded division.

    Scale shape: interval alignment is ONE self-equi-join on the
    uniform (url, snap) key — snap+1 shifted onto the same key, never a
    window (a K-snapshot archive would buffer K rows per url in a
    window; the join co-locates via the same url bucketing the
    snapshots are stored under) — then ONE map-side-combinable host
    census."""
    a = history.select(F.col(url_col).alias("url"),
                       F.col(snap_col).cast("long").alias("_s"),
                       F.col(hash_col).alias("_h1"))
    b = history.select(F.col(url_col).alias("url"),
                       (F.col(snap_col).cast("long") - 1).alias("_s"),
                       F.col(hash_col).alias("_h2"))
    pairs = a.join(b, ["url", "_s"])
    per = pairs.select(
        url_host(F.col("url")).alias("host"),
        (F.col("_h1") != F.col("_h2")).cast("int").alias("_c"))
    agg = per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("_c").cast("long").alias("n_changed"))
    n, x = F.col("n_intervals"), F.col("n_changed")
    bucket = (F.when(x * 2 >= n, F.lit("fast"))
              .when(x * 10 >= n, F.lit("medium"))
              .when(x > 0, F.lit("slow"))
              .otherwise(F.lit("static")))
    return agg.select(
        "host", "n_intervals", "n_changed",
        (x.cast("double") / n.cast("double")).alias("change_fraction"),
        bucket.alias("revisit_bucket"))


def crawl_schedule(frontier: DataFrame, host_col: str = "source",
                   id_col: str = "doc_id", priority: Column | None = None,
                   host_delay_s: int = 1) -> DataFrame:
    """Politeness scheduling: serialize each host's fetches into slots
    (highest-priority first) and stamp each URL with its fetch offset —
    slot k fetches at ``(k-1)·host_delay_s`` seconds, so no host ever
    sees two concurrent requests (the crawl-delay contract every polite
    crawler honors) while distinct hosts proceed in parallel.

    Scale shape: ONE per-host window (row_number is a streaming frame —
    no buffer), which is the semantics, not an accident: per-host
    serialization IS a per-host sequential structure, so the hottest
    host bounds the schedule length exactly as it bounds the real
    crawl. Cross-host parallelism is the partitioning. Priority
    defaults to n_chars DESC (fetch the fattest pages first), ties on
    the id for a total order."""
    from pyspark.sql.window import Window

    pr = priority if priority is not None else F.col("n_chars")
    w = (Window.partitionBy(host_col)
         .orderBy(F.desc_nulls_last(pr) if priority is None else pr,
                  F.col(id_col).asc()))
    slot = F.row_number().over(w)
    return frontier.select(
        F.col(id_col).alias("doc_id"),
        F.col(host_col).alias("host"),
        slot.cast("long").alias("slot"),
        ((slot - 1) * host_delay_s).cast("long").alias("fetch_offset_s"))


def schedule_load_profile(schedule: DataFrame,
                          bucket_s: int = 16) -> DataFrame:
    """Bandwidth audit over a ``crawl_schedule``: fetches per
    ``bucket_s``-second wall-clock bucket — the global concurrency
    profile an operator checks against fetcher capacity before
    launching (the long tail is the hottest host draining alone). One
    map-side-combined groupBy over a bounded key space (offsets are
    bounded by the hottest host's queue)."""
    return (schedule
            .groupBy(F.expr(f"fetch_offset_s div {bucket_s}")
                     .alias("wave"))
            .agg(F.count(F.lit(1)).alias("fetches"),
                 F.count_distinct("host").alias("hosts_active"))
            .orderBy("wave"))
