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
  through a buffered reader — the whole file is never materialized as a
  row. Malformed records become ``status='poison'`` rows, never task
  failures (the repo-wide poison contract).

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
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Read-side output schema (poison rows carry nulls + the reason).
WARC_READ_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                    "rec_type string, warc_file string, rec_offset long, "
                    "status string")

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


def write_warc(df: DataFrame, out_dir: str, n_files: int = 8,
               url_col: str = "url", ts_col: str = "warc_ts",
               payload_col: str = "html",
               rec_type: str = "resource",
               content_type: str = "text/html") -> list:
    """Write ``df`` as ``n_files`` WARC files under ``out_dir`` (shared
    storage), one executor task per file. Deterministic: the file a url
    lands in is a stable md5 bucket and records are url-sorted within
    the file, so re-running (or a speculative retry overwriting the same
    name) produces identical bytes. Returns the collected manifest —
    ``n_files`` rows, bounded."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(key[0])
        path = os.path.join(out_dir, f"part-{bucket:05d}.warc")
        pdf = pdf.sort_values(url_col, kind="mergesort")
        n = 0
        with open(path + ".tmp", "wb") as fh:
            for url, ts, payload in zip(pdf[url_col], pdf[ts_col],
                                        pdf[payload_col]):
                fh.write(record_bytes(url, ts, bytes(payload or b""),
                                      rec_type, content_type))
                n += 1
        os.replace(path + ".tmp", path)  # atomic publish per file
        return pd.DataFrame([{
            "bucket": bucket, "warc_file": path, "n_records": n,
            "n_bytes": os.path.getsize(path)}])

    manifest = (df
                .select(url_col, ts_col, payload_col)
                .withColumn("_b", _bucket_col(F.col(url_col), n_files))
                .groupBy("_b")
                .applyInPandas(_write, MANIFEST_SCHEMA))
    return manifest.collect()


def write_wet(df: DataFrame, out_dir: str, n_files: int = 8,
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
                   "rec_offset": rec_off, "status": "poison:not-warc"}
            return
        headers = {}
        while True:
            h = fh.readline()
            if not h:  # EOF inside headers
                yield {"url": None, "warc_ts": None, "html": None,
                       "rec_type": None, "warc_file": fname,
                       "rec_offset": rec_off,
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
                   "rec_offset": rec_off,
                   "status": "poison:bad-content-length"}
            return
        payload = fh.read(length)
        off += len(payload)
        tail = fh.read(4)
        off += len(tail)
        if len(payload) != length or tail != b"\r\n\r\n":
            yield {"url": None, "warc_ts": None, "html": None,
                   "rec_type": None, "warc_file": fname,
                   "rec_offset": rec_off, "status": "poison:truncated"}
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
               "warc_file": fname, "rec_offset": rec_off, "status": "ok"}


def read_warc(spark: SparkSession, path: str,
              glob: str = "*.warc") -> DataFrame:
    """Distributed WARC read: binaryFile lists+shards the files (path
    column only — content is pruned, never loaded as a row), then each
    task stream-parses its files. Files are the parallelism unit, the
    standard shape for record-stream formats with no internal split
    points."""
    paths = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob)
             .load(path)
             .select("path"))

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # SWAP POINT (cluster): this opener handles file:// paths (the
        # sandbox and any POSIX-mounted shared storage). For s3://hdfs://
        # paths swap `open` for an fsspec/pyarrow.fs input stream — the
        # record parser consumes any buffered byte stream unchanged.
        for pdf in batches:
            for p in pdf["path"]:
                local = p[len("file:"):] if p.startswith("file:") else p
                rows = []
                try:
                    with open(local, "rb") as raw:
                        rows.extend(_parse_stream(
                            io.BufferedReader(raw), local))
                except OSError as exc:
                    rows.append({"url": None, "warc_ts": None, "html": None,
                                 "rec_type": None, "warc_file": local,
                                 "rec_offset": 0,
                                 "status": f"poison:io:{exc.errno}"})
                if rows:
                    yield pd.DataFrame(rows)

    return paths.mapInPandas(_parse, WARC_READ_SCHEMA)
