"""Streaming surface tests: the file-source extraction stream produces the
same rows as the batch operator (exactly-once via checkpoint), incremental
drops are picked up without reprocessing, and the watermarked windowed agg
matches its batch twin on bounded input."""

from __future__ import annotations

import os
import shutil

import pytest

from ocr_automation_system_spark.corpus import generate_corpus
from ocr_automation_system_spark.functions.windows import tumbling_window_agg
from ocr_automation_system_spark.operators.extract import extract_documents
from ocr_automation_system_spark.streaming.stream import (
    stream_documents, streaming_extraction, windowed_event_counts,
    write_extraction_stream,
)


@pytest.fixture()
def doc_dir(tmp_path):
    """Two parquet 'crawl drops' written separately."""
    d = str(tmp_path / "docs_in")
    os.makedirs(d)
    full = generate_corpus(200, seed=11)
    full.iloc[:120].to_parquet(os.path.join(d, "drop1.parquet"), index=False,
                               coerce_timestamps="us", allow_truncated_timestamps=True)
    return d, full


def _run_stream(spark, d, out, ckpt):
    stream = streaming_extraction(stream_documents(spark, d))
    q = write_extraction_stream(stream, out, ckpt)
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_stream_matches_batch_and_resumes(spark, doc_dir, tmp_path):
    d, full = doc_dir
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    got1 = _run_stream(spark, d, out, ckpt)
    assert got1.count() == 120

    # Second drop lands; re-trigger picks up ONLY the new file.
    full.iloc[120:].to_parquet(os.path.join(d, "drop2.parquet"), index=False,
                               coerce_timestamps="us", allow_truncated_timestamps=True)
    got2 = _run_stream(spark, d, out, ckpt)
    assert got2.count() == 200

    batch = extract_documents(spark.read.parquet(d))
    key = lambda r: (r["url"], r["doc_status"], r["document_type"],
                     r["extracted_text"], r["fields_json"])
    assert sorted(map(key, got2.collect())) == sorted(map(key, batch.collect()))


def test_windowed_counts_match_batch_twin(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # Batch twin groups on date_trunc; run the streaming aggregation in
    # batch mode on the same bounded input (watermark is a no-op there).
    stream_style = windowed_event_counts(events.withColumn(
        "ts", events["ts"].cast("timestamp")))
    batch_style = tumbling_window_agg(events).select(
        "window_start", "event_type", "n_events", "total_value")
    key = lambda r: (str(r["window_start"]), r["event_type"],
                     r["n_events"], round(r["total_value"], 6))
    assert sorted(map(key, stream_style.collect())) == \
           sorted(map(key, batch_style.collect()))
