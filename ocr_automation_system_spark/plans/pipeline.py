"""End-to-end pipeline assembly (reference lifecycle EP1-EP3, SURVEY.md §3).

Stage graph::

    documents scan (Iceberg/parquet)
      └─ extract_documents            # narrow, two-pass, mapInPandas
           ├─ results sink            # partitioned parquet / Iceberg
           ├─ extraction_metrics      # per-partition lineage rows (G5)
           ├─ build_entities          # shuffle #1: 3-way full-outer join
           │    └─ run_rules          # narrow wide-projection + explode
           │         └─ entity_report # shuffle #2: groupBy(entity_key)
           ├─ duplicate_id_check      # shuffle: groupBy(pan)
           └─ checksum_consistency    # broadcast-eligible derived-key join

Only two shuffle boundaries touch the full corpus-derived data; extraction
itself is embarrassingly parallel, which is what makes the N->4N scaling
efficiency hold (BASELINE.md target >= 0.8)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.adapters import (
    build_entities, checksum_consistency_check, duplicate_id_check,
)
from ..operators.extract import extract_documents, extraction_metrics
from ..operators.report import entity_report
from ..operators.rules import run_rules
from ..sources.catalog import write_results


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    output_dir: str | None = None,
    as_of: str = "2026-01-01",
) -> dict:
    """Run the full pipeline; optionally persist every sink table under
    ``output_dir``. Returns the DataFrames keyed by sink name."""
    results = extract_documents(documents)
    if output_dir:
        # Persist extraction once; downstream stages re-read the committed
        # table instead of recomputing the UDF pass (also the resume point).
        path = os.path.join(output_dir, "extractions")
        write_results(results, path, partition_by=["document_type"])
        results = spark.read.parquet(path)

    entities = build_entities(results)
    validation = run_rules(entities, as_of=as_of)
    report = entity_report(validation, generated_at=as_of)
    dup = duplicate_id_check(results)
    checksum = checksum_consistency_check(results)
    metrics = extraction_metrics(results)

    sinks = {
        "extractions": results,
        "entities": entities,
        "validation_results": validation,
        "entity_reports": report,
        "duplicate_ids": dup,
        "checksum_checks": checksum,
        "lineage_metrics": metrics,
    }
    if output_dir:
        for name, df in sinks.items():
            if name == "extractions":
                continue
            write_results(df, os.path.join(output_dir, name))
    return sinks
