"""Report aggregation (G1-G3 in SURVEY.md §2.7).

The reference's ``ReportGenerator`` (`verification_engine/
report_generator.py:222-265`) computes per-entity summary counters and an
overall-status decision cascade over one entity's rule results. Here it is a
``groupBy(entity_key)`` with conditional-count aggregates (map-side partial
aggregation; shuffle on the entity key only) and the cascade as a ``when``
chain over the aggregates. ``report_generated_at`` is a job parameter, not
``datetime.now()`` (determinism, SURVEY.md §7)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rules import CRITICAL, FAIL, PASS, SKIPPED, WARNING


def entity_report(validation_results: DataFrame, generated_at: str = "") -> DataFrame:
    """G1+G2: per-entity summary + matches/mismatches lists.

    ``matches``/``mismatches`` mirror the PASS vs FAIL|WARNING partition of
    `report_generator.py:27-43`, collected as sorted arrays of
    "RULE_ID: message" strings for determinism."""
    c = F.col
    agg = (
        validation_results.groupBy("entity_key")
        .agg(
            F.count(F.lit(1)).alias("total_rules"),
            F.count(F.when(c("status") == PASS, 1)).alias("passed"),
            F.count(F.when(c("status") == FAIL, 1)).alias("failed"),
            F.count(F.when(c("status") == WARNING, 1)).alias("warnings"),
            F.count(F.when(c("status") == SKIPPED, 1)).alias("skipped"),
            F.count(F.when((c("status") == FAIL) & (c("severity") == CRITICAL), 1))
             .alias("critical_failures"),
            F.sort_array(F.collect_list(
                F.when(c("status") == PASS,
                       F.concat(c("rule_id"), F.lit(": "), c("message"))))).alias("matches"),
            F.sort_array(F.collect_list(
                F.when(c("status").isin(FAIL, WARNING),
                       F.concat(c("rule_id"), F.lit(": "), c("message"))))).alias("mismatches"),
        )
    )
    overall = (
        F.when(c("critical_failures") > 0, F.lit("FAILED (Critical issues found)"))
        .when(c("failed") > 0, F.lit("FAILED"))
        .when(c("warnings") > 0, F.lit("PASSED WITH WARNINGS"))
        .otherwise(F.lit("PASSED"))
    )
    pass_rate = F.when(
        c("total_rules") > 0,
        F.concat(F.format_number(c("passed") / c("total_rules") * 100, 1), F.lit("%")),
    ).otherwise(F.lit("N/A"))
    out = agg.withColumn("overall_status", overall).withColumn("pass_rate", pass_rate)
    if generated_at:
        out = out.withColumn("report_generated_at", F.lit(generated_at))
    return out


def entity_info(entities: DataFrame) -> DataFrame:
    """G3 (`report_generator.py:253-265`): report header — first non-null
    raw name across docs + key ids, 'N/A' convention preserved."""
    c = F.col

    def nz(col):
        return F.coalesce(F.nullif(col, F.lit("")), F.lit("N/A"))

    return entities.select(
        "entity_key",
        nz(F.coalesce(c("pan_doc.raw_name"), c("gst_doc.raw_name"), c("udyam_doc.raw_name")))
            .alias("name"),
        nz(c("pan_doc.pan")).alias("pan"),
        nz(c("gst_doc.gst_number")).alias("gst_number"),
        nz(c("udyam_doc.udyam_number")).alias("udyam_number"),
        nz(c("udyam_doc.incorporation_date")).alias("incorporation_date"),
    )


def format_report(report_row, entity_row=None) -> str:
    """S6 console sink (`report_generator.py:148-220`): pretty-print ONE
    collected entity-report row. Driver-side presentation over an already-
    aggregated row — never a data-plane operator (SURVEY.md §2.1)."""
    r = report_row.asDict() if hasattr(report_row, "asDict") else dict(report_row)
    lines = ["=" * 60, "CROSS-DOCUMENT VERIFICATION REPORT", "=" * 60]
    if entity_row is not None:
        e = entity_row.asDict() if hasattr(entity_row, "asDict") else dict(entity_row)
        lines += [f"Entity: {e.get('name', 'N/A')}",
                  f"PAN: {e.get('pan', 'N/A')}  GSTIN: {e.get('gst_number', 'N/A')}  "
                  f"Udyam: {e.get('udyam_number', 'N/A')}", "-" * 60]
    lines += [
        f"Overall: {r['overall_status']}   Pass rate: {r['pass_rate']}",
        f"Rules: {r['total_rules']}  PASS={r['passed']}  FAIL={r['failed']}  "
        f"WARN={r['warnings']}  SKIP={r['skipped']}  "
        f"critical_failures={r['critical_failures']}",
    ]
    for title, key in (("MISMATCHES", "mismatches"), ("MATCHES", "matches")):
        items = [m for m in (r.get(key) or []) if m]
        if items:
            lines.append(f"--- {title} ---")
            lines += [f"  * {m}" for m in items]
    lines.append("=" * 60)
    return "\n".join(lines)


def status_ordered(validation_results: DataFrame) -> DataFrame:
    """O4 (`report_generator.py:201-215`): presentation ordering
    FAIL -> WARNING -> PASS -> SKIPPED via a status-rank map."""
    rank = (
        F.when(F.col("status") == FAIL, 0)
        .when(F.col("status") == WARNING, 1)
        .when(F.col("status") == PASS, 2)
        .otherwise(3)
    )
    return validation_results.orderBy(rank, "entity_key", "rule_id")
