"""Production-style job entry point.

Cluster invocation (the north rule's ``spark-submit --py-files`` contract)::

    ZIP=$(python -c 'import sys; sys.path.insert(0,"/root/repo");
    from ocr_automation_system_spark.session import package_zip; print(package_zip())')
    spark-submit --py-files "$ZIP" scripts/spark_submit_job.py \
        --input /data/documents --output /data/out \
        --n-buckets 1024 --as-of 2026-01-01

Local smoke run::

    python scripts/spark_submit_job.py --synthetic 2000 --output /tmp/job_out

Stages: resumable bucketed extraction (checkpoint manifest + lineage) ->
entity join -> validation rules -> report/duplicate-id/checksum sinks.
Rerunning the same command after a kill resumes from the last committed
bucket.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_automation_system_spark.operators.adapters import (  # noqa: E402
    build_entities, checksum_consistency_check, duplicate_id_check,
)
from ocr_automation_system_spark.operators.report import entity_report  # noqa: E402
from ocr_automation_system_spark.operators.rules import run_rules  # noqa: E402
from ocr_automation_system_spark.plans.resume import (  # noqa: E402
    lineage_summary, read_extractions, run_resumable_extraction,
)
from ocr_automation_system_spark.session import build_session  # noqa: E402
from ocr_automation_system_spark.sources.catalog import write_results  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="documents table path (parquet/Iceberg)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate an N-row synthetic corpus instead of --input")
    p.add_argument("--output", required=True)
    p.add_argument("--n-buckets", type=int, default=16)
    p.add_argument("--as-of", default="2026-01-01")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    spark = build_session(app_name="ocr_automation_system_spark_job", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        from ocr_automation_system_spark.corpus import write_corpus

        corpus_path = os.path.join(args.output, "synthetic_documents.parquet")
        os.makedirs(args.output, exist_ok=True)
        if not os.path.exists(corpus_path):
            write_corpus(corpus_path, args.synthetic)
        documents = spark.read.parquet(corpus_path)
    elif args.input:
        documents = spark.read.parquet(args.input)
    else:
        p.error("one of --input / --synthetic is required")

    status = run_resumable_extraction(
        spark, documents, args.output, n_buckets=args.n_buckets)
    print(f"extraction: ran={len(status['ran'])} "
          f"skipped={len(status['skipped'])} buckets")

    results = read_extractions(spark, args.output)
    validation = run_rules(build_entities(results), as_of=args.as_of)
    write_results(validation, os.path.join(args.output, "validation_results"))
    write_results(entity_report(validation, generated_at=args.as_of),
                  os.path.join(args.output, "entity_reports"))
    write_results(duplicate_id_check(results),
                  os.path.join(args.output, "duplicate_ids"))
    write_results(checksum_consistency_check(results),
                  os.path.join(args.output, "checksum_checks"))

    summary = lineage_summary(args.output, args.n_buckets)
    print(f"done: {summary['total_rows']} docs across "
          f"{len(summary['buckets'])} committed buckets")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
