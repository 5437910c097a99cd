"""Legacy duplicate verification engine (SURVEY.md §2.6 tail note).

The reference carries TWO rule engines: the class-based registry
(`verification_engine/engine.py`, R1-R12 — `operators/rules.py` here) and
an older procedural one (`verification_engine/verification.py:80-163`)
with its own simpler adapters and scoring:

* `normalize_text` (`verification.py:10-12`): upper -> strip
  `[^A-Z0-9 ]` -> strip. NO space collapse, NO M/S|SHRI prefix strip —
  deliberately different from the modern A1 normalizer.
* 7 rules (`run_verification`, `verification.py:138-163`): three
  name-equality pairs, two PAN-equality checks, ONE 2-point
  PIN+city address score (`verification.py:106-119` — vs the modern
  R6's 5-field ratio), and the incorporation-vs-commencement signal.
* No SKIPPED status: an absent document adapts to empty strings
  (`pan_adapter`/`gst_adapter` over `{}`), so its comparisons FAIL
  rather than skip — preserved here via ''-coalescing on the outer join.

Spark lift: same shape as the modern engine — per-doctype projections,
one doc per PAN key, 3-way full-outer join, then all 7 rules as ONE wide
array-of-structs projection exploded to (entity, rule) rows. Zero
shuffles beyond the entity join itself; the rules are pure column
expressions on the joined row.

Empty-vs-absent note: the reference's extractors emit every field key
(missing values are ''), so `inc == com` only ever compares strings;
both sides here coalesce NULL (absent doc / absent key) to '' and use
plain equality, which reproduces that behavior deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .adapters import (
    GST_FIELDS_SCHEMA, PAN_FIELDS_SCHEMA, UDYAM_FIELDS_SCHEMA,
)


def legacy_normalize_text(col: Column) -> Column:
    """`verification.py:10-12`: upper, remove [^A-Z0-9 ], strip ends.
    Keeps interior double spaces (unlike the modern A1) — byte parity
    with the legacy engine requires NOT collapsing them."""
    return F.coalesce(
        F.trim(F.regexp_replace(F.upper(col), r"[^A-Z0-9 ]", "")), F.lit(""))


def _nz(col: Column) -> Column:
    return F.coalesce(col, F.lit(""))


def _one_per_pan(df: DataFrame, url_col: str) -> DataFrame:
    w = Window.partitionBy("pan").orderBy(url_col)
    return (df.filter(F.col("pan") != "")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def legacy_entities(results: DataFrame) -> DataFrame:
    """Per-doctype legacy adapters (`verification.py:32-62`) + the entity
    join. `results` is the extraction output (url, document_type,
    fields_json)."""
    pan_f = F.from_json("fields_json", PAN_FIELDS_SCHEMA)
    pan = _one_per_pan(
        results.filter(F.col("document_type") == "PAN").select(
            F.col("url").alias("pan_url"),
            F.upper(F.trim(_nz(pan_f["pan"]))).alias("pan"),
            legacy_normalize_text(pan_f["name"]).alias("p_name"),
        ), "pan_url")

    gst_f = F.from_json("fields_json", GST_FIELDS_SCHEMA)
    # normalize_pan(gst_number[2:12]) — slice the RAW value, then
    # strip+upper (`gst_adapter`, verification.py:46)
    gst = _one_per_pan(
        results.filter(F.col("document_type") == "GST_CERTIFICATE").select(
            F.col("url").alias("gst_url"),
            F.upper(F.trim(F.substring(_nz(gst_f["gst_number"]), 3, 10)))
            .alias("pan"),
            legacy_normalize_text(gst_f["name"]).alias("g_name"),
            legacy_normalize_text(gst_f["principal_address"]["city"])
            .alias("g_city"),
            _nz(gst_f["principal_address"]["pin_code"]).alias("g_pin"),
        ), "gst_url")

    ud_f = F.from_json("fields_json", UDYAM_FIELDS_SCHEMA)
    udyam = _one_per_pan(
        results.filter(F.col("document_type") == "UDYAM").select(
            F.col("url").alias("udyam_url"),
            F.upper(F.trim(_nz(ud_f["pan"]))).alias("pan"),
            legacy_normalize_text(ud_f["enterprise_name"]).alias("u_name"),
            _nz(ud_f["incorporation_date"]).alias("u_inc"),
            _nz(ud_f["commencement_date"]).alias("u_com"),
            legacy_normalize_text(ud_f["official_address"]["city"])
            .alias("u_city"),
            _nz(ud_f["official_address"]["pin"]).alias("u_pin"),
        ), "udyam_url")

    ent = (
        pan.withColumnRenamed("pan", "p_pan")
        .join(gst.withColumnRenamed("pan", "g_pan"),
              F.col("p_pan") == F.col("g_pan"), "full_outer")
        .join(udyam.withColumnRenamed("pan", "u_pan"),
              F.coalesce(F.col("p_pan"), F.col("g_pan")) == F.col("u_pan"),
              "full_outer")
        .select(
            F.coalesce("p_pan", "g_pan", "u_pan").alias("entity_key"),
            *[_nz(F.col(c)).alias(c) for c in (
                "p_pan", "p_name", "g_pan", "g_name", "g_city", "g_pin",
                "u_pan", "u_name", "u_inc", "u_com", "u_city", "u_pin")],
        )
    )
    return ent


def _rule(rule_id, status: Column, details) -> Column:
    return F.struct(
        F.lit(rule_id).alias("rule"),
        status.alias("status"),
        (details if isinstance(details, Column) else F.lit(details))
        .alias("details"),
    )


def legacy_verification(results: DataFrame) -> DataFrame:
    """`run_verification` (`verification.py:138-163`) over every entity:
    one output row per (entity_key, rule), exact legacy rule ids,
    statuses and details strings."""
    ent = legacy_entities(results)

    def name_match(a, b, a_col, b_col):
        ok = (F.col(a_col) != "") & (F.col(a_col) == F.col(b_col))
        return _rule(f"NAME_MATCH_{a}_{b}",
                     F.when(ok, "PASS").otherwise("FAIL"),
                     f"{a} name vs {b} name")

    def pan_match(doc, other_col):
        ok = (F.col("p_pan") != "") & (F.col("p_pan") == F.col(other_col))
        return _rule(f"PAN_MATCH_PAN_{doc}",
                     F.when(ok, "PASS").otherwise("FAIL"),
                     f"PAN vs {doc} PAN")

    score = (
        ((F.col("g_pin") != "") & (F.col("g_pin") == F.col("u_pin")))
        .cast("int")
        + ((F.col("g_city") != "") & (F.col("g_city") == F.col("u_city")))
        .cast("int")
    )
    addr_rule = _rule(
        "GST_UDYAM_PRINCIPAL_ADDRESS_MATCH",
        F.when(score == 2, "PASS").when(score == 1, "WARNING")
        .otherwise("FAIL"),
        F.concat(F.lit("Address match score: "), score.cast("string"),
                 F.lit("/2")),
    )
    inc_rule = _rule(
        "INCORPORATION_VS_COMMENCEMENT",
        F.when(F.col("u_inc") == F.col("u_com"), "WARNING")
        .otherwise("PASS"),
        "Same date indicates possible existing entity",
    )

    rules = F.array(
        name_match("pan", "gst", "p_name", "g_name"),
        name_match("pan", "udyam", "p_name", "u_name"),
        name_match("gst", "udyam", "g_name", "u_name"),
        pan_match("gst", "g_pan"),
        pan_match("udyam", "u_pan"),
        addr_rule,
        inc_rule,
    )
    return (ent.select("entity_key", F.explode(rules).alias("r"))
            .select("entity_key", F.col("r.rule").alias("rule"),
                    F.col("r.status").alias("status"),
                    F.col("r.details").alias("details")))
