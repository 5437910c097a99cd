"""WARC sink/source (sources/warc.py): byte-deterministic bucketed
writes, lossless roundtrip (binary + empty payloads, microsecond
timestamps), HTTP-envelope stripping for response records, poison rows
for malformed framing, and the WET conversion export."""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from ocr_automation_system_spark.sources.warc import (
    read_warc, record_bytes, write_warc, write_wet,
)

SCHEMA = "url string, warc_ts timestamp, html binary, text string"


def _df(spark):
    ts = dt.datetime(2026, 1, 2, 3, 4, 5, 123456)
    rows = [
        (f"https://h{i}.example.com/p{i}", ts + dt.timedelta(seconds=i),
         (b"<html>" + bytes([i % 256, 0xFF, 0x00]) + b"</html>"),
         f"text {i}")
        for i in range(40)
    ] + [("https://empty.example.com/", ts, b"", "")]
    return spark.createDataFrame(rows, SCHEMA)


def test_warc_roundtrip_lossless(spark, tmp_path):
    df = _df(spark)
    out = str(tmp_path / "warc")
    manifest = write_warc(df, out, n_files=4)
    assert sum(r["n_records"] for r in manifest) == 41
    assert {r["bucket"] for r in manifest} <= set(range(4))
    back = read_warc(spark, out)
    assert back.filter(F.col("status") != "ok").count() == 0
    want = sorted((r["url"], r["warc_ts"], bytes(r["html"]))
                  for r in df.collect())
    got = sorted((r["url"], r["warc_ts"], bytes(r["html"]))
                 for r in back.collect())
    assert got == want  # microseconds + raw bytes survive


def test_warc_write_is_partitioning_invariant(spark, tmp_path):
    df = _df(spark)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(df, d1, n_files=4)
    write_warc(df.repartition(13, "warc_ts"), d2, n_files=4)

    def digest(d):
        return {f: hashlib.md5(open(os.path.join(d, f), "rb").read())
                .hexdigest() for f in sorted(os.listdir(d))}

    assert digest(d1) == digest(d2)


def test_response_record_strips_http_envelope(spark, tmp_path):
    body = b"<html>hello</html>"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
    rec = record_bytes("https://x.example.com/", "2026-01-01T00:00:00.000000Z",
                       http, rec_type="response",
                       content_type="application/http; msgtype=response")
    p = tmp_path / "in" / "f.warc"
    os.makedirs(p.parent)
    p.write_bytes(rec)
    got = read_warc(spark, str(p.parent)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["status"] == "ok" and r["rec_type"] == "response"
    assert bytes(r["html"]) == body  # envelope gone, body intact


@pytest.mark.parametrize("payload,expect", [
    (b"GARBAGE NOT A WARC\r\n", "poison:not-warc"),
    (b"WARC/1.0\r\nWARC-Type: resource\r\n\r\n",
     "poison:bad-content-length"),
    (record_bytes("https://x/", "2026-01-01T00:00:00.000000Z",
                  b"full payload")[:-10], "poison:truncated"),
])
def test_malformed_warc_yields_poison_not_failure(spark, tmp_path, payload,
                                                  expect):
    p = tmp_path / "in" / "bad.warc"
    os.makedirs(p.parent)
    p.write_bytes(payload)
    got = read_warc(spark, str(p.parent)).collect()
    assert [r["status"] for r in got] == [expect]
    assert got[0]["rec_offset"] == 0


def test_good_records_before_corruption_survive(spark, tmp_path):
    good = record_bytes("https://ok.example.com/",
                        "2026-01-01T00:00:00.000000Z", b"fine")
    p = tmp_path / "in" / "mix.warc"
    os.makedirs(p.parent)
    p.write_bytes(good + b"NOISE")
    rows = {r["status"]: r for r in read_warc(spark, str(p.parent)).collect()}
    assert rows["ok"]["url"] == "https://ok.example.com/"
    assert "poison:not-warc" in rows
    assert rows["poison:not-warc"]["rec_offset"] == len(good)


def test_wet_export_roundtrip(spark, tmp_path):
    df = _df(spark)
    out = str(tmp_path / "wet")
    write_wet(df, out, n_files=2)
    back = read_warc(spark, out)
    got = sorted((r["url"], bytes(r["html"]).decode("utf-8"))
                 for r in back.collect())
    want = sorted((r["url"], r["text"]) for r in df.collect())
    assert got == want
    assert back.select("rec_type").distinct().collect()[0][0] == "conversion"


def test_job_ingests_warc_input(spark, tmp_path):
    """spark_submit_job --input-warc: Common-Crawl wire format straight
    into the resumable extraction pipeline; poison records dropped with
    a count, good records extracted."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import spark_submit_job

    from ocr_automation_system_spark.corpus import write_corpus

    cp = str(tmp_path / "docs.parquet")
    write_corpus(cp, 120)
    warc_dir = str(tmp_path / "warc_in")
    write_warc(spark.read.parquet(cp), warc_dir, n_files=2)
    with open(os.path.join(warc_dir, "part-00000.warc"), "ab") as fh:
        fh.write(b"TRAILING GARBAGE")
    out = str(tmp_path / "job")
    rc = spark_submit_job.main(
        ["--input-warc", warc_dir, "--output", out, "--n-buckets", "4"],
        stop_session=False)
    assert rc == 0
    res = spark.read.parquet(os.path.join(out, "extractions"))
    assert res.count() == 120  # every good record extracted, garbage gone


def test_read_warc_chunked_yields_identical_output(spark, tmp_path):
    """O(chunk) reader contract: a multi-record file streamed through a
    chunk_records far below the record count yields exactly the rows of
    a whole-file read — chunk boundaries are invisible in the output."""
    df = _df(spark)
    out = str(tmp_path / "warc")
    write_warc(df, out, n_files=2)

    def rows(chunk):
        return sorted(
            (r["url"], r["warc_ts"], bytes(r["html"]), r["status"])
            for r in read_warc(spark, out, chunk_records=chunk).collect())

    whole = rows(1_000_000)
    assert rows(3) == whole and rows(1) == whole
    assert len(whole) == 41


def test_write_warc_derives_n_files_from_input_size(spark, tmp_path):
    """n_files=None sizes files from the scan's input bytes (~1 GiB
    target -> 1 file for a tiny parquet input), and falls back to a
    sane default for non-file-backed inputs."""
    from ocr_automation_system_spark.sources.warc import _derived_n_files

    src = str(tmp_path / "src.parquet")
    _df(spark).write.parquet(src)
    disk = spark.read.parquet(src)
    assert _derived_n_files(disk) == 1
    # target of 1 byte/file -> one file per input byte bucket, >1 files
    assert _derived_n_files(disk, target_bytes=1) > 1
    # in-memory DataFrame has no input files -> None (caller falls back)
    assert _derived_n_files(_df(spark)) is None

    out = str(tmp_path / "auto")
    manifest = write_warc(disk, out)  # n_files omitted
    assert len(manifest) == 1 and manifest[0]["n_records"] == 41
    got = read_warc(spark, out)
    assert got.filter(F.col("status") == "ok").count() == 41


def test_write_warc_staging_is_attempt_unique(spark, tmp_path):
    """Concurrent speculative attempts must never share a staging file:
    staging names are uuid-suffixed per attempt (unit-checked on the
    helper, since executor workers are separate processes), publish is a
    whole-file atomic rename, and stale tmp litter from a crashed
    attempt neither corrupts the output nor blocks the rename."""
    import ocr_automation_system_spark.sources.warc as W

    p = str(tmp_path / "part-00000.warc")
    s1, s2 = W._staging_path(p), W._staging_path(p)
    assert s1 != s2 and s1.startswith(p + ".tmp-")

    out = str(tmp_path / "warc")
    os.makedirs(out)
    # crashed-attempt litter: must not interleave into the fresh write
    with open(os.path.join(out, "part-00000.warc.tmp-dead"), "wb") as fh:
        fh.write(b"garbage from a dead attempt")
    df = _df(spark)
    write_warc(df, out, n_files=1)
    got = read_warc(spark, out)
    assert got.filter(F.col("status") == "ok").count() == 41


def test_rec_length_and_cdx_ranged_read_law(spark, tmp_path):
    """The CDX promise: rec_length tiles each file exactly (offsets are
    the prefix sums, the lengths sum to the file size), and a RANGED
    read of [rec_offset, rec_offset+rec_length) re-parses to the same
    record — random access without touching any other byte."""
    import io as _io

    from ocr_automation_system_spark.sources.warc import (
        _parse_stream, cdx_index,
    )

    rows = [(f"https://h{i % 3}.example/k/{i:08d}",
             "2026-01-01 00:00:00", f"payload {i} " .encode() * (i + 1))
            for i in range(12)]
    df = spark.createDataFrame(rows, "url string, warc_ts string, html binary") \
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    out = str(tmp_path / "warcs")
    write_warc(df, out, n_files=3)

    recs = read_warc(spark, out).filter(F.col("status") == "ok")
    per_file = {}
    for r in recs.collect():
        per_file.setdefault(r["warc_file"], []).append(r)
    assert per_file
    for path, rs in per_file.items():
        rs.sort(key=lambda r: r["rec_offset"])
        expect = 0
        for r in rs:
            assert r["rec_offset"] == expect  # offsets tile the file
            expect += r["rec_length"]
        assert expect == os.path.getsize(path)  # lengths sum to size

    # ranged read: any CDX row alone recovers its record
    idx = cdx_index(recs).collect()
    assert len(idx) == 12
    by_url = {r["url"]: r for r in idx}
    for url in (rows[0][0], rows[7][0]):
        c = by_url[url]
        full = os.path.join(out, c["warc_file"])
        with open(full, "rb") as fh:
            fh.seek(c["rec_offset"])
            chunk = fh.read(c["rec_length"])
        (rec,) = list(_parse_stream(_io.BytesIO(chunk), "ranged"))
        assert rec["status"] == "ok" and rec["url"] == url
        assert rec["rec_length"] == c["rec_length"]
    # SURT urlkey sorts subdomain-adjacent
    assert by_url[rows[0][0]]["urlkey"].startswith("example,h0)")


def test_job_ingests_jsonl_input(spark, tmp_path):
    """spark_submit_job --input-jsonl: base64-payload JSONL straight
    into the resumable extraction pipeline; corrupt and keyless lines
    dropped with a count, good records extracted."""
    import base64
    import gzip
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import spark_submit_job

    from ocr_automation_system_spark.corpus import write_corpus

    cp = str(tmp_path / "docs.parquet")
    write_corpus(cp, 80)
    rows = spark.read.parquet(cp).select("url", "warc_ts", "html").collect()
    jl_dir = str(tmp_path / "jsonl_in")
    os.makedirs(jl_dir)
    with gzip.open(os.path.join(jl_dir, "part0.jsonl.gz"), "wt") as fh:
        for r in rows:
            fh.write(json.dumps({
                "url": r["url"],
                "warc_ts": str(r["warc_ts"]),
                "html_b64": base64.b64encode(bytes(r["html"])).decode(),
            }) + "\n")
        fh.write("{ this line is not json }\n")
        fh.write(json.dumps({"warc_ts": "2025-01-01 00:00:00",
                             "html_b64": ""}) + "\n")  # keyless
    out = str(tmp_path / "job")
    rc = spark_submit_job.main(
        ["--input-jsonl", jl_dir, "--output", out, "--n-buckets", "4"],
        stop_session=False)
    assert rc == 0
    res = spark.read.parquet(os.path.join(out, "extractions"))
    assert res.count() == 80  # every good line extracted, junk dropped
