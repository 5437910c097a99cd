"""Cross-document validation rules R1-R12 (SURVEY.md §2.6).

The reference runs 12 reflection-discovered rule classes sequentially over
one in-memory entity (`verification_engine/engine.py:73-116`,
`rules/*.py`). Here the registry is *data*: each rule is a function from the
joined entity row's columns to a ``struct(status, message)`` column, and the
whole rule set is ONE wide projection + ``explode`` — a single narrow stage
over the A8 entity join, whole-stage codegen end to end, no Python.

Skip semantics mirror ``BaseRule.has_required_data`` + per-rule field guards
(`rules/base_rule.py:115-135`): missing doc or missing field -> SKIPPED, so
a rule can never fail for absent data. ``stop_on_critical_fail`` sequential
short-circuiting does not distribute; the reference default is False
(`config.py:26`) and we preserve that default (SURVEY.md §3 EP3 note).

Config filtering (F8, `engine.py:84-92`): disabled rule ids and the severity
threshold filter the exploded results — a predicate on a tiny dimension,
pushed by Catalyst."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PASS, FAIL, WARNING, SKIPPED = "PASS", "FAIL", "WARNING", "SKIPPED"
CRITICAL, WARN_SEV, INFO = "CRITICAL", "WARNING", "INFO"

# INFO < WARNING < CRITICAL (`config.py:43-45`).
SEVERITY_RANK = {INFO: 0, WARN_SEV: 1, CRITICAL: 2}


def _res(status, message) -> Column:
    return F.struct(status.alias("status"), message.alias("message"))


def _skip(reason: str) -> Column:
    return _res(F.lit(SKIPPED), F.lit(f"Skipped: {reason}"))


def _empty(col: Column) -> Column:
    return col.isNull() | (F.trim(col) == "")


def _name_equality_rule(a_doc: str, b_doc: str, a_label: str, b_label: str) -> Column:
    """R1-R3 shape (`name_rules.py:11-146`): equality of A1-normalized
    names with doc-missing and field-missing skip guards."""
    a_name = F.col(f"{a_doc}.legal_name")
    b_name = F.col(f"{b_doc}.legal_name")
    return (
        F.when(F.col(a_doc).isNull() | F.col(b_doc).isNull(),
               _skip(f"Missing {a_label} or {b_label} data"))
        .when(_empty(a_name) | _empty(b_name),
              _skip("Name field missing in one or both documents"))
        .when(a_name == b_name,
              _res(F.lit(PASS), F.lit(f"{a_label} name matches {b_label} name")))
        .otherwise(_res(F.lit(FAIL), F.lit(f"{a_label} name does NOT match {b_label} name")))
    )


def _pan_equality_rule(a_doc: str, b_doc: str, a_label: str, b_label: str) -> Column:
    """R4/R5 shape (`pan_rules.py`): PAN equality; for GST the compared key
    is the GSTIN-derived PAN (P10, pre-derived in A6)."""
    a_pan = F.col(f"{a_doc}.pan")
    b_pan = F.col(f"{b_doc}.pan")
    return (
        F.when(F.col(a_doc).isNull() | F.col(b_doc).isNull(),
               _skip(f"Missing {a_label} or {b_label} data"))
        .when(_empty(a_pan) | _empty(b_pan),
              _skip("PAN missing in one or both documents"))
        .when(a_pan == b_pan,
              _res(F.lit(PASS), F.concat(F.lit("PAN matches: "), a_pan)))
        .otherwise(_res(F.lit(FAIL), F.lit(f"{a_label} PAN does NOT match {b_label}")))
    )


def _address_score_rule() -> Column:
    """R6 (`address_rules.py:12-85`): field-by-field score over
    [pin, city, district, state, locality]; max_score counts fields where at
    least one side is non-empty; PASS if score==max, WARNING if >=60%, FAIL
    otherwise."""
    gst_addr = F.col("gst_doc.principal_address")
    ud_addr = F.col("udyam_doc.registered_address")
    fields = ["pin", "city", "district", "state", "locality"]

    def val(addr, f):
        src = "locality" if f == "locality" else f
        return F.upper(F.trim(F.coalesce(addr[src], F.lit(""))))

    pair_scores = []
    pair_max = []
    for f in fields:
        a, b = val(gst_addr, f), val(ud_addr, f)
        pair_max.append(F.when((a != "") | (b != ""), 1).otherwise(0))
        pair_scores.append(F.when((a != "") & (b != "") & (a == b), 1).otherwise(0))
    score = sum(pair_scores[1:], pair_scores[0])
    max_score = sum(pair_max[1:], pair_max[0])

    addr_missing = (gst_addr.isNull() | (gst_addr["full_address"] == "")
                    | ud_addr.isNull() | (ud_addr["full_address"] == ""))
    score_msg = F.concat(F.lit("Address field match "), score.cast("string"),
                         F.lit("/"), max_score.cast("string"))
    return (
        F.when(F.col("gst_doc").isNull() | F.col("udyam_doc").isNull(),
               _skip("Missing GST or Udyam data"))
        .when(addr_missing, _skip("Address data missing from one or both documents"))
        .when(score == max_score,
              _res(F.lit(PASS), F.lit("GST principal address matches Udyam registered office")))
        .when(score >= max_score * 0.6, _res(F.lit(WARNING), score_msg))
        .otherwise(_res(F.lit(FAIL), score_msg))
    )


def _pin_match_rule() -> Column:
    """R7 (`address_rules.py:88-129`)."""
    gst_pin = F.trim(F.coalesce(F.col("gst_doc.principal_address")["pin"], F.lit("")))
    ud_pin = F.trim(F.coalesce(F.col("udyam_doc.registered_address")["pin"], F.lit("")))
    return (
        F.when(F.col("gst_doc").isNull() | F.col("udyam_doc").isNull(),
               _skip("Missing GST or Udyam data"))
        .when((gst_pin == "") | (ud_pin == ""),
              _skip("PIN code missing from one or both documents"))
        .when(gst_pin == ud_pin,
              _res(F.lit(PASS), F.concat(F.lit("PIN codes match: "), gst_pin)))
        .otherwise(_res(F.lit(FAIL), F.lit("PIN codes do NOT match")))
    )


def _factory_containment_rule() -> Column:
    """R8 (`address_rules.py:132-191`): containment semi-join — any Udyam
    factory PIN substring-contained in the GST additional-places string.
    ``exists`` over the factory array keeps it row-local (no explode/shuffle
    needed because factories are already nested per entity)."""
    gst_additional = F.coalesce(F.col("gst_doc.additional_places"), F.lit(""))
    factories = F.col("udyam_doc.factory_addresses")
    any_match = F.exists(
        factories,
        lambda fac: (fac["pin"] != "") & F.upper(gst_additional).contains(fac["pin"]),
    )
    return (
        F.when(F.col("gst_doc").isNull() | F.col("udyam_doc").isNull(),
               _skip("Missing GST or Udyam data"))
        .when(_empty(gst_additional) | (gst_additional == "NA"),
              _skip("No additional places in GST"))
        .when(factories.isNull() | (F.size(factories) == 0),
              _skip("No factory/unit addresses in Udyam"))
        .when(any_match, _res(F.lit(PASS), F.lit("Found matching factory address(es) by PIN")))
        .otherwise(_res(F.lit(WARNING),
                        F.lit("Could not match GST additional places with Udyam factory addresses")))
    )


def _infer_constitution_from_name(name: Column) -> Column:
    """R9 inference table (`constitution_rules.py:68-88`): 4 ordered
    keyword groups over the uppercased name; '' when uninferable."""
    up = F.upper(F.coalesce(name, F.lit("")))
    patterns = [
        ("PRIVATE LIMITED", ["PRIVATE LIMITED", "PVT LTD", "PVT. LTD.", "PRIVATE LTD"]),
        ("PUBLIC LIMITED", ["PUBLIC LIMITED", "PUBLIC LTD"]),
        ("LLP", ["LLP", "LIMITED LIABILITY PARTNERSHIP"]),
        ("PARTNERSHIP", ["PARTNERSHIP"]),
    ]
    expr = F.lit("")
    for canonical, keywords in reversed(patterns):
        cond = None
        for kw in keywords:
            c = up.contains(F.lit(kw))
            cond = c if cond is None else (cond | c)
        expr = F.when(cond, F.lit(canonical)).otherwise(expr)
    return expr


def _constitution_rule() -> Column:
    """R9 (`constitution_rules.py:11-88`): GST constitution vs constitution
    inferred from the Udyam raw name; PASS-with-caveat when uninferable."""
    gst_const = F.coalesce(F.col("gst_doc.constitution"), F.lit(""))
    inferred = _infer_constitution_from_name(
        F.coalesce(F.nullif(F.col("udyam_doc.raw_name"), F.lit("")),
                   F.col("udyam_doc.legal_name"))
    )
    return (
        F.when(F.col("gst_doc").isNull() | F.col("udyam_doc").isNull(),
               _skip("Missing GST or Udyam data"))
        .when(gst_const == "", _skip("Constitution missing from GST certificate"))
        .when(inferred == "",
              _res(F.lit(PASS), F.lit("Could not infer constitution from Udyam name (check manually)")))
        .when(gst_const == inferred,
              _res(F.lit(PASS), F.concat(F.lit("Constitution match: "), gst_const)))
        .otherwise(_res(F.lit(WARNING),
                        F.concat(F.lit("Constitution may not match: GST='"), gst_const,
                                 F.lit("' vs inferred='"), inferred, F.lit("'"))))
    )


def _incorporation_date_rule() -> Column:
    """R10 (`date_rules.py:12-53`): date-string equality with per-field skips."""
    pan_date = F.coalesce(F.col("pan_doc.incorporation_date"), F.lit(""))
    ud_date = F.coalesce(F.col("udyam_doc.incorporation_date"), F.lit(""))
    return (
        F.when(F.col("pan_doc").isNull() | F.col("udyam_doc").isNull(),
               _skip("Missing PAN or Udyam data"))
        .when(pan_date == "", _skip("Incorporation date missing from PAN"))
        .when(ud_date == "", _skip("Incorporation date missing from Udyam"))
        .when(pan_date == ud_date,
              _res(F.lit(PASS), F.concat(F.lit("Incorporation dates match: "), pan_date)))
        .otherwise(_res(F.lit(FAIL), F.lit("Incorporation dates do NOT match")))
    )


def _entity_age_rule(as_of: str) -> Column:
    """R11 (`date_rules.py:56-109`): age = (as_of - dd/MM/yyyy)/365.25,
    NEW if < 2 years. The reference's ``datetime.now()`` is nondeterministic
    (SURVEY.md §7); ``as_of`` is a job parameter instead. Unparseable date
    -> SKIPPED (the reference's ValueError branch)."""
    ud_date_s = F.coalesce(F.col("udyam_doc.incorporation_date"), F.lit(""))
    parsed = F.try_to_timestamp(ud_date_s, F.lit("dd/MM/yyyy")).cast("date")
    age_years = F.datediff(F.lit(as_of).cast("date"), parsed) / F.lit(365.25)
    status_word = F.when(age_years < 2, F.lit("NEW")).otherwise(F.lit("EXISTING"))
    return (
        F.when(F.col("udyam_doc").isNull(), _skip("Missing Udyam data"))
        .when(ud_date_s == "", _skip("Incorporation date not available"))
        .when(parsed.isNull(),
              _res(F.lit(SKIPPED), F.concat(F.lit("Skipped: Could not parse date: "), ud_date_s)))
        .otherwise(_res(F.lit(PASS),
                        F.concat(F.lit("Entity is "), status_word,
                                 F.lit(" (incorporated "),
                                 F.round(age_years, 1).cast("string"),
                                 F.lit(" years ago)"))))
    )


def _commencement_rule() -> Column:
    """R12 (`date_rules.py:112-161`): equal dates -> WARNING (existing-entity
    signal); differing or absent commencement -> PASS."""
    inc = F.coalesce(F.col("udyam_doc.incorporation_date"), F.lit(""))
    com = F.coalesce(F.col("udyam_doc.commencement_date"), F.lit(""))
    return (
        F.when(F.col("udyam_doc").isNull(), _skip("Missing Udyam data"))
        .when((inc == "") | (com == ""),
              _res(F.lit(PASS), F.lit("Commencement date not available for comparison")))
        .when(inc == com,
              _res(F.lit(WARNING),
                   F.lit("Incorporation and commencement dates are same - may indicate existing entity")))
        .otherwise(_res(F.lit(PASS), F.lit("Incorporation and commencement dates differ")))
    )


def rule_specs(as_of: str = "2026-01-01") -> list:
    """The declarative registry: (rule_id, severity, source_docs, column)."""
    return [
        ("NAME_MATCH_PAN_GST", CRITICAL, ["PAN", "GST"],
         _name_equality_rule("pan_doc", "gst_doc", "PAN", "GST")),
        ("NAME_MATCH_PAN_UDYAM", CRITICAL, ["PAN", "UDYAM"],
         _name_equality_rule("pan_doc", "udyam_doc", "PAN", "UDYAM")),
        ("NAME_MATCH_GST_UDYAM", CRITICAL, ["GST", "UDYAM"],
         _name_equality_rule("gst_doc", "udyam_doc", "GST", "UDYAM")),
        ("PAN_MATCH_GST", CRITICAL, ["PAN", "GST"],
         _pan_equality_rule("pan_doc", "gst_doc", "PAN", "GST")),
        ("PAN_MATCH_UDYAM", CRITICAL, ["PAN", "UDYAM"],
         _pan_equality_rule("pan_doc", "udyam_doc", "PAN", "UDYAM")),
        ("ADDR_GST_PRINCIPAL_UDYAM_OFFICE", WARN_SEV, ["GST", "UDYAM"], _address_score_rule()),
        ("PIN_MATCH_GST_UDYAM", CRITICAL, ["GST", "UDYAM"], _pin_match_rule()),
        ("ADDR_GST_ADDITIONAL_UDYAM_FACTORY", INFO, ["GST", "UDYAM"], _factory_containment_rule()),
        ("CONSTITUTION_GST_UDYAM", WARN_SEV, ["GST", "UDYAM"], _constitution_rule()),
        ("INCORPORATION_DATE_PAN_UDYAM", CRITICAL, ["PAN", "UDYAM"], _incorporation_date_rule()),
        ("ENTITY_AGE_CHECK", INFO, ["UDYAM"], _entity_age_rule(as_of)),
        ("INCORPORATION_VS_COMMENCEMENT", INFO, ["UDYAM"], _commencement_rule()),
    ]


def run_rules(
    entities: DataFrame,
    as_of: str = "2026-01-01",
    disabled_rules: set | None = None,
    severity_filter: str | None = None,
) -> DataFrame:
    """Entities -> validation_results: one row per (entity, rule).

    One wide projection builds all 12 rule results as an array of structs,
    then ``explode`` — no shuffle after the entity join. F8 config filters
    (`engine.py:84-92`): ``disabled_rules`` drops rule ids; ``severity_filter``
    keeps rules with severity rank >= the threshold."""
    disabled = disabled_rules or set()
    specs = [s for s in rule_specs(as_of) if s[0] not in disabled]
    if severity_filter:
        threshold = SEVERITY_RANK[severity_filter]
        specs = [s for s in specs if SEVERITY_RANK[s[1]] >= threshold]

    rule_array = F.array(*[
        F.struct(
            F.lit(rule_id).alias("rule_id"),
            col["status"].alias("status"),
            col["message"].alias("message"),
            F.lit(severity).alias("severity"),
            F.array(*[F.lit(d) for d in docs]).alias("source_docs"),
        )
        for rule_id, severity, docs, col in specs
    ])
    return (
        entities.select("entity_key", F.explode(rule_array).alias("r"))
        .select("entity_key", "r.rule_id", "r.status", "r.message",
                "r.severity", "r.source_docs")
    )
