"""Canonicalization adapters + entity join (A1-A8 in SURVEY.md §2.5).

The reference adapters (`/root/reference/project/verification_engine/
adapters/*`) are per-document dict projections; here each is a JVM-side
column-expression projection over the extraction results — whole-stage
codegen, no Python. These columns are join keys and comparison values, not
golden text, so [B] expressions are allowed (SURVEY.md §7 byte-identity
rule: golden-affecting transforms stay in Python UDFs; keys/metrics go JVM).

The entity builder (A8, `engine.py:47-71`) becomes a real 3-way full-outer
join on the normalized PAN key — the reference holds exactly one entity in
memory, so its "join" is implicit; at 10^12 rows this is shuffle boundary #1
(AQE-tuned, skew-salted — see ``salted_entity_join``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, StringType, StructField, StructType,
)

# -- from_json schemas for the per-doctype fields_json / tables_json ----------

GST_ADDRESS_SCHEMA = StructType([
    StructField(k, StringType()) for k in (
        "floor_no", "building_flat_no", "premises_name", "road_street",
        "nearby_landmark", "locality", "city", "district", "state", "pin_code",
    )
])
GST_FIELDS_SCHEMA = StructType([
    StructField("name", StringType()),
    StructField("constitution_of_business", StringType()),
    StructField("principal_address", GST_ADDRESS_SCHEMA),
    StructField("particulars_of_approving_authority", StringType()),
    StructField("gst_number", StringType()),
    StructField("total_no_of_additional_places", StringType()),
    StructField("additional_place_of_business", StringType()),
])

UDYAM_ADDRESS_SCHEMA = StructType([
    StructField(k, StringType()) for k in (
        "flat_no", "building", "village_town", "block", "road", "city",
        "state", "district", "pin", "mobile", "email",
    )
])
UDYAM_FIELDS_SCHEMA = StructType([
    StructField("udyam_number", StringType()),
    StructField("enterprise_name", StringType()),
    StructField("pan", StringType()),
    StructField("mobile", StringType()),
    StructField("email", StringType()),
    StructField("incorporation_date", StringType()),
    StructField("commencement_date", StringType()),
    StructField("official_address", UDYAM_ADDRESS_SCHEMA),
])
UDYAM_TABLES_SCHEMA = StructType([
    StructField("classification_history", ArrayType(StructType([
        StructField("sno", StringType()),
        StructField("classification_year", StringType()),
        StructField("enterprise_type", StringType()),
        StructField("classification_date", StringType()),
    ]))),
    StructField("employment_details", StructType([
        StructField(k, DoubleType()) for k in ("male", "female", "other", "total")
    ])),
    StructField("units_details", ArrayType(StructType([
        StructField(k, StringType()) for k in (
            "sno", "unit_name", "flat", "building", "village_town", "block",
            "road", "pin", "state", "district",
        )
    ]))),
    StructField("bank_details", StructType([
        StructField(k, StringType()) for k in ("bank_name", "ifsc_code", "account_number")
    ])),
])

PAN_FIELDS_SCHEMA = StructType([
    StructField("pan", StringType()),
    StructField("pan_type", StringType()),
    StructField("name", StringType()),
    StructField("incorporation_date", StringType()),
])


# -- A1-A3: scalar normalizers (column expressions) ---------------------------

def normalize_name(col: Column) -> Column:
    """A1 (`base_adapter.py:44-69`): upper, strip M/S|MESSRS|SHRI|SMT
    prefixes, strip non-[A-Z0-9 ], collapse spaces — the join-key
    canonicalization for name matching."""
    c = F.upper(F.trim(col))
    c = F.regexp_replace(c, r"^(M/S\.?\s*|MESSRS\.?\s*|SHRI\s+|SMT\.?\s*)", "")
    c = F.regexp_replace(c, r"[^A-Z0-9 ]", "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def normalize_pan(col: Column) -> Column:
    """A2 (`base_adapter.py:71-76`)."""
    return F.upper(F.trim(col))


def normalize_date(col: Column) -> Column:
    """A3 (`base_adapter.py:78-90`): [-.] separators -> /."""
    return F.regexp_replace(F.trim(col), r"[-.]", "/")


def _nz(col: Column) -> Column:
    """'' for NULL — the adapters' missing-value convention."""
    return F.coalesce(col, F.lit(""))


def _first_nonempty(*cols: Column) -> Column:
    """A4's alias resolution: first non-empty of a priority key list."""
    return F.coalesce(*[F.nullif(F.upper(F.trim(c)), F.lit("")) for c in cols], F.lit(""))


def normalized_address(flat, building, road, locality, city, district, state, pin) -> Column:
    """A4 (`base_adapter.py:92-147`): canonical 8-key address struct +
    synthesized full_address (concat_ws skips empties like the reference's
    non-empty join)."""
    fields = {
        "flat_no": flat, "building": building, "road": road,
        "locality": locality, "city": city, "district": district,
        "state": state, "pin": pin,
    }
    cleaned = {k: _first_nonempty(v) for k, v in fields.items()}
    full = F.concat_ws(", ", *[F.nullif(c, F.lit("")) for c in cleaned.values()])
    return F.struct(*[c.alias(k) for k, c in cleaned.items()], full.alias("full_address"))


# -- A5-A7: per-doctype normalized projections --------------------------------

def adapt_pan(results: DataFrame) -> DataFrame:
    """A5 (`pan_adapter.py:18-44`)."""
    df = results.filter(F.col("document_type") == "PAN").withColumn(
        "f", F.from_json("fields_json", PAN_FIELDS_SCHEMA)
    )
    return df.select(
        F.col("url").alias("pan_url"),
        normalize_pan(_nz(F.col("f.pan"))).alias("pan"),
        normalize_name(_nz(F.col("f.name"))).alias("legal_name"),
        _nz(F.col("f.pan_type")).alias("pan_type"),
        normalize_date(_nz(F.col("f.incorporation_date"))).alias("incorporation_date"),
        _nz(F.col("f.name")).alias("raw_name"),
    )


def adapt_gst(results: DataFrame) -> DataFrame:
    """A6 (`gst_adapter.py:18-56`) incl. P10 PAN-from-GSTIN."""
    df = results.filter(F.col("document_type") == "GST_CERTIFICATE").withColumn(
        "f", F.from_json("fields_json", GST_FIELDS_SCHEMA)
    )
    addr = F.col("f.principal_address")
    return df.select(
        F.col("url").alias("gst_url"),
        normalize_name(_nz(F.col("f.name"))).alias("legal_name"),
        _nz(F.col("f.gst_number")).alias("gst_number"),
        F.upper(F.substring(_nz(F.col("f.gst_number")), 3, 10)).alias("pan"),
        normalize_constitution_expr(_nz(F.col("f.constitution_of_business"))).alias("constitution"),
        _nz(F.col("f.constitution_of_business")).alias("raw_constitution"),
        normalized_address(
            addr["building_flat_no"], addr["premises_name"], addr["road_street"],
            addr["locality"], addr["city"], addr["district"], addr["state"],
            addr["pin_code"],
        ).alias("principal_address"),
        _nz(F.col("f.additional_place_of_business")).alias("additional_places"),
        F.coalesce(F.nullif(F.col("f.total_no_of_additional_places"), F.lit("")), F.lit("0"))
         .alias("total_additional_places"),
        _nz(F.col("f.name")).alias("raw_name"),
    )


def adapt_udyam(results: DataFrame) -> DataFrame:
    """A7 (`udyam_adapter.py:18-99`) incl. top-1-by-year enterprise type
    (O1: the reference's sort+[0] becomes ``array_sort`` + ``element_at``)
    and per-unit factory-address normalization via ``transform``."""
    df = (
        results.filter(F.col("document_type") == "UDYAM")
        .withColumn("f", F.from_json("fields_json", UDYAM_FIELDS_SCHEMA))
        .withColumn("t", F.from_json("tables_json", UDYAM_TABLES_SCHEMA))
    )
    addr = F.col("f.official_address")
    # O1 — `_get_current_enterprise_type` (`udyam_adapter.py:85-99`):
    # latest classification_year wins. try_element_at: a doc whose
    # classification table didn't survive extraction (e.g. OCR-leg line
    # drops) has an EMPTY array — plain element_at would throw task-killing
    # INVALID_ARRAY_INDEX, violating the poison-row contract.
    enterprise_type = F.try_element_at(
        F.reverse(F.array_sort(F.col("t.classification_history"))), F.lit(1)
    )["enterprise_type"]
    factories = F.transform(
        F.col("t.units_details"),
        lambda u: F.struct(
            F.regexp_replace(F.trim(u["unit_name"]), r"\s+", " ").alias("unit_name"),
            F.upper(F.trim(F.coalesce(u["pin"], F.lit("")))).alias("pin"),
            F.concat_ws(
                ", ",
                F.nullif(F.upper(F.trim(u["flat"])), F.lit("")),
                F.nullif(F.upper(F.trim(u["building"])), F.lit("")),
                F.nullif(F.upper(F.trim(u["road"])), F.lit("")),
                F.nullif(F.upper(F.trim(u["village_town"])), F.lit("")),
                F.nullif(F.upper(F.trim(u["district"])), F.lit("")),
                F.nullif(F.upper(F.trim(u["state"])), F.lit("")),
                F.nullif(F.upper(F.trim(u["pin"])), F.lit("")),
            ).alias("full_address"),
        ),
    )
    return df.select(
        F.col("url").alias("udyam_url"),
        normalize_name(_nz(F.col("f.enterprise_name"))).alias("legal_name"),
        normalize_pan(_nz(F.col("f.pan"))).alias("pan"),
        _nz(F.col("f.udyam_number")).alias("udyam_number"),
        normalize_date(_nz(F.col("f.incorporation_date"))).alias("incorporation_date"),
        normalize_date(_nz(F.col("f.commencement_date"))).alias("commencement_date"),
        normalized_address(
            addr["flat_no"], addr["building"], addr["road"], addr["village_town"],
            addr["city"], addr["district"], addr["state"], addr["pin"],
        ).alias("registered_address"),
        F.coalesce(factories, F.array()).alias("factory_addresses"),
        _nz(enterprise_type).alias("enterprise_type"),
        _nz(F.col("f.mobile")).alias("mobile"),
        _nz(F.col("f.email")).alias("email"),
        _nz(F.col("f.enterprise_name")).alias("raw_name"),
    )


def normalize_constitution_expr(col: Column) -> Column:
    """A-variant constitution normalization (P16, `base_adapter.py:150-179`):
    10 canonical categories, input returned as-is when unmatched (distinct
    from P15 which returns '')."""
    up = F.upper(F.trim(col))
    chain = [
        ("PRIVATE LIMITED", ["PRIVATE LIMITED", "PVT LTD", "PRIVATE LTD", "PRIVATE LIMITED COMPANY"]),
        ("PUBLIC LIMITED", ["PUBLIC LIMITED", "PUBLIC LTD", "PUBLIC LIMITED COMPANY"]),
        ("LLP", ["LLP", "LIMITED LIABILITY PARTNERSHIP"]),
        ("PARTNERSHIP", ["PARTNERSHIP", "PARTNERSHIP FIRM"]),
        ("PROPRIETORSHIP", ["PROPRIETORSHIP", "SOLE PROPRIETORSHIP", "PROPRIETOR"]),
        ("HUF", ["HUF", "HINDU UNDIVIDED FAMILY"]),
        ("TRUST", ["TRUST"]),
        ("SOCIETY", ["SOCIETY"]),
        ("AOP", ["AOP", "ASSOCIATION OF PERSONS"]),
        ("BOI", ["BOI", "BODY OF INDIVIDUALS"]),
    ]
    expr = up  # unmatched -> as-is
    for canonical, variants in reversed(chain):
        cond = None
        for v in variants:
            c = up.contains(F.lit(v))
            cond = c if cond is None else (cond | c)
        expr = F.when(cond, F.lit(canonical)).otherwise(expr)
    return F.when(col.isNull() | (F.trim(col) == ""), F.lit("")).otherwise(expr)


# -- A8: entity join -----------------------------------------------------------

def _dedupe_per_key(df: DataFrame, url_col: str) -> DataFrame:
    """One doc per (pan, doctype): first by url — deterministic, and the
    relational form of the reference's single-entity assumption. Window +
    row_number (SURVEY.md §2.7 note on top-1-per-group)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("pan").orderBy(F.col(url_col))
    return (
        df.filter(F.col("pan") != "")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def build_entities(results: DataFrame) -> DataFrame:
    """A8 (`engine.py:47-71`): full-outer 3-way join of the normalized
    per-doctype frames on the PAN entity key; absent docs become NULL
    structs (the reference's ``{}``).

    Scale note: the join keys are near-unique (one entity per PAN), so the
    shuffle is uniform; AQE handles residual skew. Each side is deduped to
    one doc per key first, bounding the join output to |keys|."""
    pan_docs = _dedupe_per_key(adapt_pan(results), "pan_url")
    gst_docs = _dedupe_per_key(adapt_gst(results), "gst_url")
    udyam_docs = _dedupe_per_key(adapt_udyam(results), "udyam_url")

    pan_side = pan_docs.select(
        F.col("pan").alias("entity_key"),
        F.struct(*[F.col(c) for c in pan_docs.columns]).alias("pan_doc"),
    )
    gst_side = gst_docs.select(
        F.col("pan").alias("entity_key"),
        F.struct(*[F.col(c) for c in gst_docs.columns]).alias("gst_doc"),
    )
    udyam_side = udyam_docs.select(
        F.col("pan").alias("entity_key"),
        F.struct(*[F.col(c) for c in udyam_docs.columns]).alias("udyam_doc"),
    )
    return (
        pan_side.join(gst_side, "entity_key", "full_outer")
        .join(udyam_side, "entity_key", "full_outer")
    )


def duplicate_id_check(results: DataFrame) -> DataFrame:
    """The north rule's duplicate-id consistency check: PANs claimed by
    conflicting normalized names. A pure groupBy (map-side partial agg);
    this is shuffle boundary #2 and is skew-safe because PAN cardinality is
    ~|entities|."""
    docs = (
        results.filter(F.col("entity_pan") != "")
        .select(
            F.col("entity_pan").alias("pan"),
            normalize_name(F.col("entity_name")).alias("name"),
        )
    )
    return (
        docs.groupBy("pan")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.when(F.col("name") != "", F.col("name"))).alias("n_names"),
            F.sort_array(F.collect_set(F.when(F.col("name") != "", F.col("name")))).alias("names"),
        )
        .withColumn("is_conflict", F.col("n_names") > F.lit(1))
    )


def checksum_consistency_check(results: DataFrame) -> DataFrame:
    """R4-shaped derived-key join at corpus scale: every GST doc's embedded
    PAN (GSTIN chars 3-12) must exist as a PAN doc with the same id. A
    broadcast-eligible equi-join on a derived key (`north_star`'s "checksum
    consistency check")."""
    gst = results.filter(
        (F.col("document_type") == "GST_CERTIFICATE") & (F.col("entity_gstin") != "")
    ).select(
        F.col("url").alias("gst_url"),
        F.col("entity_gstin").alias("gstin"),
        F.upper(F.substring("entity_gstin", 3, 10)).alias("derived_pan"),
    )
    pans = results.filter(
        (F.col("document_type") == "PAN") & (F.col("entity_pan") != "")
    ).select(F.col("entity_pan").alias("pan")).distinct()
    return (
        gst.join(pans, gst["derived_pan"] == pans["pan"], "left_outer")
        .select(
            "gst_url", "gstin", "derived_pan",
            F.col("pan").isNotNull().cast(BooleanType()).alias("pan_doc_exists"),
        )
    )
