"""Payload-size sensitivity bench: docs/sec AND MB/s at ~1.5KB vs
production-sized (~100KB) pages.

At the 100 TB design point what matters is bytes/sec through the
extraction operator, not row counts — fat pages stress the Arrow batch
memory budget and the JVM<->Python transfer path. Run after changes to the
extraction operator or Arrow batch sizing:

    python scripts/payload_bench.py [--rows 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_automation_system_spark.corpus import CORPUS_FINGERPRINT, CORPUS_VERSION, write_corpus  # noqa: E402
from ocr_automation_system_spark.operators.extract import extract_documents  # noqa: E402
from ocr_automation_system_spark.session import build_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000)
    args = ap.parse_args()

    spark = build_session("payload_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Arrow batches sized down for fat payloads: 256 rows x ~100KB ≈ 25MB.
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")

    from pyspark.sql import functions as F

    for scale, label in ((1, "thin (~1.5KB)"), (40, "fat (~60-100KB)")):
        path = os.path.join(tempfile.gettempdir(),
                            f"payload_corpus_v{CORPUS_VERSION}_{CORPUS_FINGERPRINT}"
                            f"_s{scale}_{args.rows}.parquet")
        if not os.path.exists(path):
            write_corpus(path, args.rows, payload_scale=scale)
        docs = spark.read.parquet(path) \
            .repartition(spark.sparkContext.defaultParallelism).persist()
        n = docs.count()
        total_mb = docs.select(F.sum(F.length("html"))).collect()[0][0] / 1e6
        extract_documents(docs).count()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            extract_documents(docs).count()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "payload": label, "n_docs": n,
            "avg_payload_kb": round(total_mb * 1000 / n, 1),
            "sec": round(best, 2),
            "docs_per_sec": round(n / best, 1),
            "mb_per_sec": round(total_mb / best, 1),
        }))
        docs.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
