"""WARC source/sink — the Common-Crawl wire format.

The reference reads loose PDF files from a directory
(`/root/reference/project/main.py`); the web-scale twin of that source
is WARC: terabytes of crawl captures shipped as ~1 GB record-stream
files. This module implements both directions Spark-first:

* **sink** — ``write_warc``: one WARC file per url-hash bucket, written
  from the executors (``applyInPandas`` per bucket), records sorted by
  url inside each file so the artifact is byte-deterministic under any
  input partitioning. Returns the per-file manifest (the lineage rows a
  resumable crawl exporter checkpoints).
* **source** — ``read_warc``: the file list is the parallelism unit
  (exactly how production WARC readers shard — a 100 TB crawl is ~10^5
  files spread across executors). Paths come from the ``binaryFile``
  reader with ONLY the path column selected (the format prunes the
  content read), and each task stream-parses its files record-by-record
  through a buffered reader, flushing an Arrow batch every
  ``chunk_records`` records — task memory is **O(chunk)**, never
  O(file). Malformed records become ``status='poison'`` rows, never
  task failures (the repo-wide poison contract).

Memory bounds, stated honestly: the READ side is O(chunk_records ×
mean record size) per task. The WRITE side is **O(file)** per task —
``applyInPandas`` hands each bucket to its writer as one pandas frame
(the price of the url-sorted byte-deterministic artifact) — so the
per-task bound is set by the file size target: ``n_files`` defaults to
``ceil(input_bytes / 1 GiB)`` when the input is file-backed, i.e. each
writer task holds ~1 GiB, a normal executor working set.

Record layout written (WARC/1.0, ``resource`` records; ``conversion``
for WET text exports)::

    WARC/1.0\r\n
    WARC-Type: resource\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: %Y-%m-%dT%H:%M:%S.%fZ\r\n
    Content-Type: text/html\r\n
    Content-Length: <n>\r\n
    \r\n
    <payload>\r\n\r\n

``response`` records (Common Crawl's raw captures) are also parsed on
read: the HTTP envelope is split off at the first CRLFCRLF and the body
returned as the payload.
"""

from __future__ import annotations

import io
import math
import os
import re
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: write-side file size target when ``n_files`` is derived (1 GiB —
#: the conventional WARC shard size, and the writer task's memory bound).
TARGET_FILE_BYTES = 1 << 30

#: Read-side output schema (poison rows carry nulls + the reason).
WARC_READ_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                    "rec_type string, warc_file string, rec_offset long, "
                    "rec_length long, status string")

MANIFEST_SCHEMA = ("bucket long, warc_file string, n_records long, "
                   "n_bytes long")

_DATE_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"


def record_bytes(url: str, ts, payload: bytes,
                 rec_type: str = "resource",
                 content_type: str = "text/html") -> bytes:
    """One serialized WARC record (headers sorted-stable, CRLF framing)."""
    date = pd.Timestamp(ts).strftime(_DATE_FMT)
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {rec_type}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            f"\r\n").encode("utf-8")
    return head + payload + b"\r\n\r\n"


def _bucket_col(url, n_files: int):
    return F.pmod(F.conv(F.substring(F.md5(url), 1, 8), 16, 10)
                  .cast("long"), F.lit(n_files))


def _staging_path(path: str) -> str:
    """Attempt-unique staging name for the atomic-rename publish: two
    concurrent task attempts (speculation, zombie retries) must never
    append into one shared tmp file — each stages privately, and
    whichever ``os.replace`` lands last wins with identical bytes."""
    return f"{path}.tmp-{uuid.uuid4().hex}"


def _derived_n_files(df: DataFrame,
                     target_bytes: int = TARGET_FILE_BYTES) -> int | None:
    """Size-derived file count: ceil(input bytes / 1 GiB). Input bytes
    come from the scan's file metadata (no data pass); source parquet
    bytes upper-bound the payload bytes closely enough for a shard-size
    target. None (caller falls back) for non-file / remote sources —
    production callers on object stores pass ``n_files`` explicitly from
    catalog statistics."""
    files = df.inputFiles()
    if not files:
        return None
    total = 0
    for f in files:
        if not f.startswith("file:"):
            return None
        try:
            total += os.path.getsize(re.sub(r"^file:(//)?", "", f))
        except OSError:
            return None
    return max(1, math.ceil(total / target_bytes))


def write_warc(df: DataFrame, out_dir: str, n_files: int | None = None,
               url_col: str = "url", ts_col: str = "warc_ts",
               payload_col: str = "html",
               rec_type: str = "resource",
               content_type: str = "text/html") -> list:
    """Write ``df`` as ``n_files`` WARC files under ``out_dir`` (shared
    storage), one executor task per file. Deterministic: the file a url
    lands in is a stable md5 bucket and records are url-sorted within
    the file, so re-running produces identical bytes. Returns the
    collected manifest — ``n_files`` rows, bounded.

    ``n_files=None`` derives the count from the input size at ~1 GiB
    per file (``_derived_n_files``), which is also the writer task's
    honest memory bound: applyInPandas hands each bucket to ``_write``
    as ONE pandas frame, so per-task memory is O(file), sized here.

    Concurrent attempts (speculative retries) are safe: each attempt
    stages into its own uuid-suffixed tmp file, and ``os.replace`` then
    publishes whole-file atomically — two attempts never interleave
    bytes in a shared staging file, and both publish identical content
    (the sort makes the bytes attempt-invariant)."""
    os.makedirs(out_dir, exist_ok=True)
    if n_files is None:
        n_files = _derived_n_files(df) or 8

    def _write(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(key[0])
        path = os.path.join(out_dir, f"part-{bucket:05d}.warc")
        pdf = pdf.sort_values(url_col, kind="mergesort")
        n = 0
        tmp = _staging_path(path)  # attempt-unique staging
        with open(tmp, "wb") as fh:
            for url, ts, payload in zip(pdf[url_col], pdf[ts_col],
                                        pdf[payload_col]):
                fh.write(record_bytes(url, ts, bytes(payload or b""),
                                      rec_type, content_type))
                n += 1
        os.replace(tmp, path)  # atomic publish per file
        return pd.DataFrame([{
            "bucket": bucket, "warc_file": path, "n_records": n,
            "n_bytes": os.path.getsize(path)}])

    manifest = (df
                .select(url_col, ts_col, payload_col)
                .withColumn("_b", _bucket_col(F.col(url_col), n_files))
                .groupBy("_b")
                .applyInPandas(_write, MANIFEST_SCHEMA))
    return manifest.collect()


def write_wet(df: DataFrame, out_dir: str, n_files: int | None = None,
              url_col: str = "url", ts_col: str = "warc_ts",
              text_col: str = "text") -> list:
    """WET export: the extracted-text twin of ``write_warc`` —
    ``conversion`` records carrying UTF-8 plain text (what a trained-on
    corpus actually ships)."""
    txt = df.select(
        url_col, ts_col,
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
        .alias("_payload"))
    return write_warc(txt, out_dir, n_files, url_col, ts_col, "_payload",
                      rec_type="conversion", content_type="text/plain")


def _parse_stream(fh, fname: str) -> Iterator[dict]:
    """Record-at-a-time parse of one WARC stream. Bad framing yields one
    poison row for the file tail and stops (a corrupt length header
    means every later offset is untrustworthy)."""
    off = 0
    while True:
        rec_off = off
        line = fh.readline()
        if not line:
            return  # clean EOF
        off += len(line)
        if line.strip() == b"":  # tolerate extra blank framing lines
            continue
        if not line.startswith(b"WARC/"):
            yield {"url": None, "warc_ts": None, "html": None,
                   "rec_type": None, "warc_file": fname,
                   "rec_offset": rec_off, "rec_length": off - rec_off,
                   "status": "poison:not-warc"}
            return
        headers = {}
        while True:
            h = fh.readline()
            if not h:  # EOF inside headers
                yield {"url": None, "warc_ts": None, "html": None,
                       "rec_type": None, "warc_file": fname,
                       "rec_offset": rec_off, "rec_length": off - rec_off,
                       "status": "poison:truncated-headers"}
                return
            off += len(h)
            if h in (b"\r\n", b"\n"):
                break
            k, _, v = h.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers[b"content-length"])
        except (KeyError, ValueError):
            yield {"url": None, "warc_ts": None, "html": None,
                   "rec_type": None, "warc_file": fname,
                   "rec_offset": rec_off, "rec_length": off - rec_off,
                   "status": "poison:bad-content-length"}
            return
        payload = fh.read(length)
        off += len(payload)
        tail = fh.read(4)
        off += len(tail)
        if len(payload) != length or tail != b"\r\n\r\n":
            yield {"url": None, "warc_ts": None, "html": None,
                   "rec_type": None, "warc_file": fname,
                   "rec_offset": rec_off, "rec_length": off - rec_off,
                   "status": "poison:truncated"}
            return
        rec_type = headers.get(b"warc-type", b"").decode("utf-8", "replace")
        if rec_type == "response":
            # strip the HTTP envelope: body starts after the first CRLFCRLF
            sep = payload.find(b"\r\n\r\n")
            payload = payload[sep + 4:] if sep >= 0 else b""
        url = headers.get(b"warc-target-uri")
        date = headers.get(b"warc-date")
        try:
            ts = pd.to_datetime(date.decode("ascii")) if date else None
            if ts is not None and ts.tzinfo is not None:
                ts = ts.tz_convert("UTC").tz_localize(None)
        except (ValueError, UnicodeDecodeError):
            ts = None
        yield {"url": url.decode("utf-8", "replace") if url else None,
               "warc_ts": ts, "html": payload, "rec_type": rec_type,
               "warc_file": fname, "rec_offset": rec_off,
               "rec_length": off - rec_off, "status": "ok"}


def read_warc(spark: SparkSession, path: str, glob: str = "*.warc",
              chunk_records: int = 1024) -> DataFrame:
    """Distributed WARC read: binaryFile lists+shards the files (path
    column only — content is pruned, never loaded as a row), then each
    task stream-parses its files. Files are the parallelism unit, the
    standard shape for record-stream formats with no internal split
    points.

    Memory bound is O(chunk): the parser is a generator and the task
    flushes an Arrow batch every ``chunk_records`` records — a 1 GiB
    WARC file with 10^5 records never exists as one task-side list."""
    paths = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob)
             .load(path)
             .select("path"))

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # SWAP POINT (cluster): this opener handles file:// paths (the
        # sandbox and any POSIX-mounted shared storage). For s3://hdfs://
        # paths swap `open` for an fsspec/pyarrow.fs input stream — the
        # record parser consumes any buffered byte stream unchanged.
        rows: list[dict] = []
        for pdf in batches:
            for p in pdf["path"]:
                local = p[len("file:"):] if p.startswith("file:") else p
                try:
                    with open(local, "rb") as raw:
                        for rec in _parse_stream(io.BufferedReader(raw),
                                                 local):
                            rows.append(rec)
                            if len(rows) >= chunk_records:
                                yield pd.DataFrame(rows)
                                rows = []
                except OSError as exc:
                    rows.append({"url": None, "warc_ts": None, "html": None,
                                 "rec_type": None, "warc_file": local,
                                 "rec_offset": 0, "rec_length": 0,
                                 "status": f"poison:io:{exc.errno}"})
        if rows:
            yield pd.DataFrame(rows)

    return paths.mapInPandas(_parse, WARC_READ_SCHEMA)


def cdx_index(recs: DataFrame) -> DataFrame:
    """CDX-style capture index from parsed WARC records — the lookup
    artifact Common Crawl publishes next to its WARC sets (cdx-*.gz /
    cluster.idx): one row per ok record, (urlkey, url, warc_ts, digest,
    warc_file, rec_offset, rec_length), enough to random-access any
    capture with a ranged read of [rec_offset, rec_offset+rec_length)
    from its file. ``urlkey`` is the SURT form (reverse-dotted host +
    ')' + path) so one host's captures sort adjacent regardless of
    subdomain order; ``digest`` is md5 over the hex payload (the
    repo's cross-engine digest convention).

    Scale: a narrow zero-shuffle projection over the parse — the index
    of a 100 TB crawl costs one pass and a sorted write; lookups then
    never touch a WARC byte until the final ranged read."""
    host = F.regexp_extract("url", r"https?://([^/]+)", 1)
    path = F.regexp_extract("url", r"https?://[^/]+(/.*)", 1)
    urlkey = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"), path)
    return (recs.filter(F.col("status") == "ok")
            .select(urlkey.alias("urlkey"), "url", "warc_ts",
                    F.md5(F.hex("html")).alias("digest"),
                    F.regexp_extract("warc_file", r"([^/]+)$", 1)
                    .alias("warc_file"),
                    "rec_offset", "rec_length"))
