"""Resumable partitioned extraction: checkpoint manifest + lineage rows.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". The reference has no resume story (a rerun is a full
recompute — SURVEY.md §2.10); this module adds it the way a 10^12-row batch
job needs it:

* The corpus is split into ``n_buckets`` deterministic url-hash buckets
  (``pmod(xxhash64(url), n)``) — the unit of commit and of retry. On
  Iceberg this maps to ``bucket(N, url)`` partition transforms and
  overwrite-by-filter commits; locally each bucket is a parquet
  subdirectory written atomically (tmp dir + rename).
* After each bucket lands, a manifest entry (JSON, one file per bucket)
  records row counts + the per-Spark-partition lineage metrics for that
  bucket. A bucket with a manifest entry is never recomputed — a killed
  job resumes by running only the missing buckets.
* Writes are idempotent: a bucket that died mid-write left no manifest, so
  the retry overwrites the partial output.

The per-bucket loop is driver-side sequencing of independent Spark jobs —
each job is a narrow scan-filter + extraction pass, so resume granularity
costs no extra shuffle. At production scale buckets run a few at a time to
bound failure blast radius while keeping the cluster saturated.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_documents, extraction_metrics

MANIFEST_DIR = "_manifest"


def bucket_expr(url_col: str = "url", n_buckets: int = 16):
    """Deterministic commit-unit assignment (Iceberg ``bucket(N, url)``
    analogue)."""
    return F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)).cast("int")


def _manifest_path(output_dir: str, bucket: int) -> str:
    return os.path.join(output_dir, MANIFEST_DIR, f"bucket_{bucket:05d}.json")


def committed_buckets(output_dir: str, n_buckets: int) -> set[int]:
    return {
        b for b in range(n_buckets)
        if os.path.exists(_manifest_path(output_dir, b))
    }


def run_resumable_extraction(
    spark: SparkSession,
    documents: DataFrame,
    output_dir: str,
    n_buckets: int = 16,
    max_buckets: int | None = None,
) -> dict:
    """Extract ``documents`` into ``output_dir/extractions/bucket=<b>/``,
    committing one url-hash bucket at a time with manifest + lineage.

    ``max_buckets`` bounds how many *new* buckets run (test hook for the
    kill/resume scenario). Returns {"ran": [...], "skipped": [...]}.
    """
    os.makedirs(os.path.join(output_dir, MANIFEST_DIR), exist_ok=True)
    done = committed_buckets(output_dir, n_buckets)
    with_bucket = documents.withColumn("_bucket", bucket_expr("url", n_buckets))

    ran, skipped = [], []
    for b in range(n_buckets):
        if b in done:
            skipped.append(b)
            continue
        if max_buckets is not None and len(ran) >= max_buckets:
            break

        slice_df = with_bucket.filter(F.col("_bucket") == b).drop("_bucket")
        results = extract_documents(slice_df)

        dest = os.path.join(output_dir, "extractions", f"bucket={b}")
        # Stage OUTSIDE the partition-discovery root: a dotted sibling of
        # `extractions/` would still be a visible partition dir to Spark
        # ("bucket=N.inprogress" -> bogus string partition value from a
        # run killed mid-write); `_staging/` at the output root is never
        # scanned by read_extractions.
        tmp = os.path.join(output_dir, "_staging", f"bucket={b}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(os.path.dirname(tmp), exist_ok=True)
        results.write.mode("overwrite").parquet(tmp)
        if os.path.exists(dest):  # stale partial from a killed run
            shutil.rmtree(dest)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.rename(tmp, dest)

        committed = spark.read.parquet(dest)
        lineage = [r.asDict() for r in extraction_metrics(committed).collect()]
        n_rows = sum(m["docs"] for m in lineage)
        manifest = {
            "bucket": b,
            "n_rows": n_rows,
            "committed_at": time.time(),
            "lineage": lineage,
        }
        mp = _manifest_path(output_dir, b)
        with open(mp + ".tmp", "w") as fh:
            json.dump(manifest, fh, indent=1, default=str)
        os.rename(mp + ".tmp", mp)  # manifest commit = the atomic point
        ran.append(b)

    return {"ran": ran, "skipped": skipped}


def read_extractions(spark: SparkSession, output_dir: str,
                     keep_bucket: bool = False) -> DataFrame:
    """All committed buckets as one DataFrame. Partition discovery turns
    the bucket= directories into a prunable ``bucket`` column; dropped by
    default so the schema matches a direct ``extract_documents`` run."""
    df = spark.read.parquet(os.path.join(output_dir, "extractions"))
    return df if keep_bucket else df.drop("bucket")


def lineage_summary(output_dir: str, n_buckets: int) -> dict:
    """Aggregate manifest view: per-bucket rows + total (job-audit
    surface; the per-Spark-partition detail stays in each manifest)."""
    out = {"buckets": {}, "total_rows": 0}
    for b in committed_buckets(output_dir, n_buckets):
        with open(_manifest_path(output_dir, b)) as fh:
            m = json.load(fh)
        out["buckets"][b] = m["n_rows"]
        out["total_rows"] += m["n_rows"]
    return out
