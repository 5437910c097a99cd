"""DuckDB SQL twins for the extraction-pipeline contract queries.

The extraction stage itself is per-document Python over BINARY payloads (not
SQL-expressible); its expected output is precomputed serially by
``oracle.twin`` into a parquet artifact (placeholder
``__TWIN_EXTRACTIONS__``, substituted by ``oracle.twin.render_sql``). The
SQL here is an *independent relational implementation* of everything
downstream of extraction — adapters (A1-A7), entity join (A8), validation
rules (R1-R12), report aggregation (G1-G2), duplicate-id / checksum /
lineage checks — mirroring ``operators/adapters.py``, ``operators/rules.py``
and ``operators/report.py`` expression by expression.

Notes on cross-engine determinism (same contract as ``queries.py``):
* string comparisons are binary in both engines (no collation);
* DuckDB ``sum(INTEGER)`` returns HUGEINT — every sum is cast back to
  BIGINT to match Spark's LongType;
* date parsing guards with a strict ``^\\d{2}/\\d{2}/\\d{4}$`` regex so
  DuckDB's lenient ``%d`` (1-2 digits) can't diverge from Spark's strict
  ``dd`` pattern;
* Spark ``round(double, 1)`` (HALF_UP) and DuckDB ``round(double, 1)``
  agree unless the scaled value is an exact binary .5 — impossible for
  ``days/365.25`` ages (tested in ``tests/test_pipeline_oracle_sql.py``).
"""

from __future__ import annotations

TWIN = "read_parquet('__TWIN_EXTRACTIONS__')"
TWIN_MEDIA = "read_parquet('__TWIN_MEDIA__')"
TWIN_BLOCKS = "read_parquet('__TWIN_BLOCKS__')"
CORPUS = "read_parquet('__CORPUS__')"


# ---------------------------------------------------------------------------
# Shared scalar fragments (adapters A1-A4)
# ---------------------------------------------------------------------------

def _norm_name(x: str) -> str:
    """A1 (`operators/adapters.py:89`)."""
    return (r"trim(regexp_replace(regexp_replace(regexp_replace("
            r"upper(trim(" + x + r")), "
            r"'^(M/S\.?\s*|MESSRS\.?\s*|SHRI\s+|SMT\.?\s*)', '', 'g'), "
            r"'[^A-Z0-9 ]', '', 'g'), '\s+', ' ', 'g'))")


def _norm_date(x: str) -> str:
    return f"regexp_replace(trim({x}), '[-.]', '/', 'g')"


def _j(field: str) -> str:
    """fields_json scalar ('' for missing/invalid — from_json semantics)."""
    return f"coalesce(json_extract_string(fj, '$.{field}'), '')"


def _fne(*exprs: str) -> str:
    """A4 first-nonempty: coalesce(nullif(upper(trim(x)),'')..., '')."""
    parts = ", ".join(f"nullif(upper(trim({e})), '')" for e in exprs)
    return f"coalesce({parts}, '')"


def _full_address(cleaned: list) -> str:
    """concat_ws(', ', non-empty values) over already-cleaned fragments."""
    parts = ", ".join(f"nullif({c}, '')" for c in cleaned)
    return f"concat_ws(', ', {parts})"


def _contains_any(up: str, variants: list) -> str:
    return " OR ".join(f"contains({up}, '{v}')" for v in variants)


_CONSTITUTION_CHAIN = [
    ("PRIVATE LIMITED", ["PRIVATE LIMITED", "PVT LTD", "PRIVATE LTD",
                         "PRIVATE LIMITED COMPANY"]),
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


def _normalize_constitution(x: str) -> str:
    """P16 twin (`adapters.py:229`): '' for empty input, canonical category
    on keyword hit, upper(trim(input)) otherwise."""
    up = f"upper(trim({x}))"
    whens = "\n    ".join(
        f"WHEN {_contains_any(up, variants)} THEN '{canon}'"
        for canon, variants in _CONSTITUTION_CHAIN
    )
    return (f"CASE WHEN {x} IS NULL OR trim({x}) = '' THEN ''\n"
            f"    {whens}\n    ELSE {up} END")


_INFER_CHAIN = [
    ("PRIVATE LIMITED", ["PRIVATE LIMITED", "PVT LTD", "PVT. LTD.", "PRIVATE LTD"]),
    ("PUBLIC LIMITED", ["PUBLIC LIMITED", "PUBLIC LTD"]),
    ("LLP", ["LLP", "LIMITED LIABILITY PARTNERSHIP"]),
    ("PARTNERSHIP", ["PARTNERSHIP"]),
]


def _infer_constitution(name: str) -> str:
    """R9 inference twin (`rules.py:152`): upper(coalesce(name,'')), 4
    ordered keyword groups, '' when uninferable."""
    up = f"upper(coalesce({name}, ''))"
    whens = "\n    ".join(
        f"WHEN {_contains_any(up, variants)} THEN '{canon}'"
        for canon, variants in _INFER_CHAIN
    )
    return f"CASE {whens}\n    ELSE '' END"


# ---------------------------------------------------------------------------
# Adapter + entity-join CTEs (A5-A8)
# ---------------------------------------------------------------------------

_UNITS_STRUCT = '[{"pin":"VARCHAR"}]'
_CLS_STRUCT = ('[{"sno":"VARCHAR","classification_year":"VARCHAR",'
               '"enterprise_type":"VARCHAR","classification_date":"VARCHAR"}]')

# GST principal address: reference key <- fields_json source
_GST_ADDR = [
    ("flat_no", "building_flat_no"), ("building", "premises_name"),
    ("road", "road_street"), ("locality", "locality"), ("city", "city"),
    ("district", "district"), ("state", "state"), ("pin", "pin_code"),
]
# Udyam registered address
_UD_ADDR = [
    ("flat_no", "flat_no"), ("building", "building"), ("road", "road"),
    ("locality", "village_town"), ("city", "city"), ("district", "district"),
    ("state", "state"), ("pin", "pin"),
]


def _addr_cols(mapping: list, prefix: str, json_root: str) -> str:
    cols = []
    cleaned = []
    for key, src in mapping:
        e = _fne(f"json_extract_string(fj, '$.{json_root}.{src}')")
        cleaned.append(e)
        cols.append(f"{e} AS {prefix}_{key}")
    cols.append(f"{_full_address(cleaned)} AS {prefix}_full")
    return ",\n    ".join(cols)


_ENTITY_CTES = f"""
res AS (SELECT * FROM {TWIN}),
pan_a AS (
  SELECT url AS pan_url,
    upper(trim({_j('pan')})) AS pan,
    {_norm_name(_j('name'))} AS legal_name,
    {_norm_date(_j('incorporation_date'))} AS incorporation_date,
    {_j('name')} AS raw_name
  FROM (SELECT url, CASE WHEN json_valid(fields_json) THEN fields_json END AS fj
        FROM res WHERE document_type = 'PAN')
),
gst_a AS (
  SELECT url AS gst_url,
    {_norm_name(_j('name'))} AS legal_name,
    {_j('gst_number')} AS gst_number,
    upper(substr({_j('gst_number')}, 3, 10)) AS pan,
    {_normalize_constitution("json_extract_string(fj, '$.constitution_of_business')")} AS constitution,
    {_addr_cols(_GST_ADDR, 'g', 'principal_address')},
    {_j('additional_place_of_business')} AS additional_places,
    {_j('name')} AS raw_name
  FROM (SELECT url, CASE WHEN json_valid(fields_json) THEN fields_json END AS fj
        FROM res WHERE document_type = 'GST_CERTIFICATE')
),
udyam_a AS (
  SELECT url AS udyam_url,
    {_norm_name(_j('enterprise_name'))} AS legal_name,
    upper(trim({_j('pan')})) AS pan,
    {_j('udyam_number')} AS udyam_number,
    {_norm_date(_j('incorporation_date'))} AS incorporation_date,
    {_norm_date(_j('commencement_date'))} AS commencement_date,
    {_addr_cols(_UD_ADDR, 'u', 'official_address')},
    coalesce(list_transform(
        json_transform(tj -> '$.units_details', '{_UNITS_STRUCT}'),
        x -> upper(trim(coalesce(x.pin, '')))), []) AS factory_pins,
    coalesce(
      list_reverse(list_sort(
        json_transform(tj -> '$.classification_history', '{_CLS_STRUCT}')
      ))[1].enterprise_type, '') AS enterprise_type,
    {_j('enterprise_name')} AS raw_name
  FROM (SELECT url,
          CASE WHEN json_valid(fields_json) THEN fields_json END AS fj,
          CASE WHEN json_valid(tables_json) THEN tables_json END AS tj
        FROM res WHERE document_type = 'UDYAM')
),
pan_1 AS (SELECT * FROM pan_a WHERE pan <> ''
          QUALIFY row_number() OVER (PARTITION BY pan ORDER BY pan_url) = 1),
gst_1 AS (SELECT * FROM gst_a WHERE pan <> ''
          QUALIFY row_number() OVER (PARTITION BY pan ORDER BY gst_url) = 1),
udyam_1 AS (SELECT * FROM udyam_a WHERE pan <> ''
            QUALIFY row_number() OVER (PARTITION BY pan ORDER BY udyam_url) = 1),
ent AS (
  SELECT coalesce(p.pan, g.pan, u.pan) AS entity_key,
    p.pan_url IS NOT NULL AS has_pan,
    g.gst_url IS NOT NULL AS has_gst,
    u.udyam_url IS NOT NULL AS has_ud,
    p.legal_name AS p_name, p.pan AS p_pan,
    p.incorporation_date AS p_incdate,
    g.legal_name AS g_name, g.pan AS g_pan, g.constitution AS g_const,
    g.g_pin, g.g_city, g.g_district, g.g_state, g.g_locality, g.g_full,
    g.additional_places AS g_additional,
    u.legal_name AS u_name, u.pan AS u_pan,
    u.incorporation_date AS u_incdate, u.commencement_date AS u_comdate,
    u.u_pin, u.u_city, u.u_district, u.u_state, u.u_locality, u.u_full,
    u.factory_pins, u.raw_name AS u_rawname
  FROM pan_1 p
  FULL JOIN gst_1 g ON p.pan = g.pan
  FULL JOIN udyam_1 u ON coalesce(p.pan, g.pan) = u.pan
)"""


# ---------------------------------------------------------------------------
# Rules R1-R12 as UNION ALL branches over ent
# ---------------------------------------------------------------------------

def _rule(rule_id: str, severity: str, docs: list, case_sql: str) -> str:
    return (f"SELECT entity_key, '{rule_id}' AS rule_id, r.status, r.message,\n"
            f"  '{severity}' AS severity, '{','.join(docs)}' AS source_docs\n"
            f"FROM (SELECT entity_key, {case_sql} AS r FROM ent)")


def _row(status: str, message_sql: str) -> str:
    return f"{{'status': '{status}', 'message': {message_sql}}}"


def _name_eq(a_has, b_has, a_name, b_name, a_label, b_label) -> str:
    return f"""CASE
  WHEN NOT {a_has} OR NOT {b_has}
    THEN {_row('SKIPPED', f"'Skipped: Missing {a_label} or {b_label} data'")}
  WHEN trim({a_name}) = '' OR trim({b_name}) = ''
    THEN {_row('SKIPPED', "'Skipped: Name field missing in one or both documents'")}
  WHEN {a_name} = {b_name}
    THEN {_row('PASS', f"'{a_label} name matches {b_label} name'")}
  ELSE {_row('FAIL', f"'{a_label} name does NOT match {b_label} name'")}
END"""


def _pan_eq(a_has, b_has, a_pan, b_pan, a_label, b_label) -> str:
    return f"""CASE
  WHEN NOT {a_has} OR NOT {b_has}
    THEN {_row('SKIPPED', f"'Skipped: Missing {a_label} or {b_label} data'")}
  WHEN trim({a_pan}) = '' OR trim({b_pan}) = ''
    THEN {_row('SKIPPED', "'Skipped: PAN missing in one or both documents'")}
  WHEN {a_pan} = {b_pan}
    THEN {_row('PASS', f"'PAN matches: ' || {a_pan}")}
  ELSE {_row('FAIL', f"'{a_label} PAN does NOT match {b_label}'")}
END"""


_ADDR_FIELDS = ["pin", "city", "district", "state", "locality"]
_ADDR_SCORE = " + ".join(
    f"(CASE WHEN g_{f} <> '' AND u_{f} <> '' AND g_{f} = u_{f} THEN 1 ELSE 0 END)"
    for f in _ADDR_FIELDS)
_ADDR_MAX = " + ".join(
    f"(CASE WHEN g_{f} <> '' OR u_{f} <> '' THEN 1 ELSE 0 END)"
    for f in _ADDR_FIELDS)

_ADDR_RULE = f"""CASE
  WHEN NOT has_gst OR NOT has_ud
    THEN {_row('SKIPPED', "'Skipped: Missing GST or Udyam data'")}
  WHEN g_full = '' OR u_full = ''
    THEN {_row('SKIPPED', "'Skipped: Address data missing from one or both documents'")}
  WHEN ({_ADDR_SCORE}) = ({_ADDR_MAX})
    THEN {_row('PASS', "'GST principal address matches Udyam registered office'")}
  WHEN ({_ADDR_SCORE}) >= ({_ADDR_MAX}) * 0.6
    THEN {_row('WARNING', f"'Address field match ' || CAST({_ADDR_SCORE} AS VARCHAR) || '/' || CAST({_ADDR_MAX} AS VARCHAR)")}
  ELSE {_row('FAIL', f"'Address field match ' || CAST({_ADDR_SCORE} AS VARCHAR) || '/' || CAST({_ADDR_MAX} AS VARCHAR)")}
END"""

_PIN_RULE = f"""CASE
  WHEN NOT has_gst OR NOT has_ud
    THEN {_row('SKIPPED', "'Skipped: Missing GST or Udyam data'")}
  WHEN trim(g_pin) = '' OR trim(u_pin) = ''
    THEN {_row('SKIPPED', "'Skipped: PIN code missing from one or both documents'")}
  WHEN trim(g_pin) = trim(u_pin)
    THEN {_row('PASS', "'PIN codes match: ' || trim(g_pin)")}
  ELSE {_row('FAIL', "'PIN codes do NOT match'")}
END"""

_FACTORY_RULE = f"""CASE
  WHEN NOT has_gst OR NOT has_ud
    THEN {_row('SKIPPED', "'Skipped: Missing GST or Udyam data'")}
  WHEN coalesce(g_additional, '') = '' OR trim(coalesce(g_additional, '')) = ''
       OR coalesce(g_additional, '') = 'NA'
    THEN {_row('SKIPPED', "'Skipped: No additional places in GST'")}
  WHEN factory_pins IS NULL OR len(factory_pins) = 0
    THEN {_row('SKIPPED', "'Skipped: No factory/unit addresses in Udyam'")}
  WHEN len(list_filter(factory_pins,
        x -> x <> '' AND contains(upper(coalesce(g_additional, '')), x))) > 0
    THEN {_row('PASS', "'Found matching factory address(es) by PIN'")}
  ELSE {_row('WARNING', "'Could not match GST additional places with Udyam factory addresses'")}
END"""

_INFERRED = _infer_constitution("coalesce(nullif(u_rawname, ''), u_name)")
_CONST_RULE = f"""CASE
  WHEN NOT has_gst OR NOT has_ud
    THEN {_row('SKIPPED', "'Skipped: Missing GST or Udyam data'")}
  WHEN coalesce(g_const, '') = ''
    THEN {_row('SKIPPED', "'Skipped: Constitution missing from GST certificate'")}
  WHEN ({_INFERRED}) = ''
    THEN {_row('PASS', "'Could not infer constitution from Udyam name (check manually)'")}
  WHEN coalesce(g_const, '') = ({_INFERRED})
    THEN {_row('PASS', "'Constitution match: ' || coalesce(g_const, '')")}
  ELSE {_row('WARNING', f"'Constitution may not match: GST=''' || coalesce(g_const, '') || ''' vs inferred=''' || ({_INFERRED}) || ''''")}
END"""

_INC_DATE_RULE = f"""CASE
  WHEN NOT has_pan OR NOT has_ud
    THEN {_row('SKIPPED', "'Skipped: Missing PAN or Udyam data'")}
  WHEN coalesce(p_incdate, '') = ''
    THEN {_row('SKIPPED', "'Skipped: Incorporation date missing from PAN'")}
  WHEN coalesce(u_incdate, '') = ''
    THEN {_row('SKIPPED', "'Skipped: Incorporation date missing from Udyam'")}
  WHEN p_incdate = u_incdate
    THEN {_row('PASS', "'Incorporation dates match: ' || p_incdate")}
  ELSE {_row('FAIL', "'Incorporation dates do NOT match'")}
END"""


def _age_rule(as_of: str) -> str:
    parse_ok = ("regexp_matches(coalesce(u_incdate, ''), '^[0-9]{2}/[0-9]{2}/[0-9]{4}$') "
                "AND try_strptime(u_incdate, '%d/%m/%Y') IS NOT NULL")
    age = (f"(datediff('day', CAST(try_strptime(u_incdate, '%d/%m/%Y') AS DATE), "
           f"DATE '{as_of}') / 365.25)")
    word = f"CASE WHEN {age} < 2 THEN 'NEW' ELSE 'EXISTING' END"
    msg = (f"'Entity is ' || ({word}) || ' (incorporated ' || "
           f"CAST(round({age}, 1) AS VARCHAR) || ' years ago)'")
    return f"""CASE
  WHEN NOT has_ud THEN {_row('SKIPPED', "'Skipped: Missing Udyam data'")}
  WHEN coalesce(u_incdate, '') = ''
    THEN {_row('SKIPPED', "'Skipped: Incorporation date not available'")}
  WHEN NOT ({parse_ok})
    THEN {_row('SKIPPED', "'Skipped: Could not parse date: ' || u_incdate")}
  ELSE {_row('PASS', msg)}
END"""


_COMMENCE_RULE = f"""CASE
  WHEN NOT has_ud THEN {_row('SKIPPED', "'Skipped: Missing Udyam data'")}
  WHEN coalesce(u_incdate, '') = '' OR coalesce(u_comdate, '') = ''
    THEN {_row('PASS', "'Commencement date not available for comparison'")}
  WHEN u_incdate = u_comdate
    THEN {_row('WARNING', "'Incorporation and commencement dates are same - may indicate existing entity'")}
  ELSE {_row('PASS', "'Incorporation and commencement dates differ'")}
END"""


def _rules_union(as_of: str = "2026-01-01") -> str:
    branches = [
        _rule("NAME_MATCH_PAN_GST", "CRITICAL", ["PAN", "GST"],
              _name_eq("has_pan", "has_gst", "p_name", "g_name", "PAN", "GST")),
        _rule("NAME_MATCH_PAN_UDYAM", "CRITICAL", ["PAN", "UDYAM"],
              _name_eq("has_pan", "has_ud", "p_name", "u_name", "PAN", "UDYAM")),
        _rule("NAME_MATCH_GST_UDYAM", "CRITICAL", ["GST", "UDYAM"],
              _name_eq("has_gst", "has_ud", "g_name", "u_name", "GST", "UDYAM")),
        _rule("PAN_MATCH_GST", "CRITICAL", ["PAN", "GST"],
              _pan_eq("has_pan", "has_gst", "p_pan", "g_pan", "PAN", "GST")),
        _rule("PAN_MATCH_UDYAM", "CRITICAL", ["PAN", "UDYAM"],
              _pan_eq("has_pan", "has_ud", "p_pan", "u_pan", "PAN", "UDYAM")),
        _rule("ADDR_GST_PRINCIPAL_UDYAM_OFFICE", "WARNING", ["GST", "UDYAM"],
              _ADDR_RULE),
        _rule("PIN_MATCH_GST_UDYAM", "CRITICAL", ["GST", "UDYAM"], _PIN_RULE),
        _rule("ADDR_GST_ADDITIONAL_UDYAM_FACTORY", "INFO", ["GST", "UDYAM"],
              _FACTORY_RULE),
        _rule("CONSTITUTION_GST_UDYAM", "WARNING", ["GST", "UDYAM"], _CONST_RULE),
        _rule("INCORPORATION_DATE_PAN_UDYAM", "CRITICAL", ["PAN", "UDYAM"],
              _INC_DATE_RULE),
        _rule("ENTITY_AGE_CHECK", "INFO", ["UDYAM"], _age_rule(as_of)),
        _rule("INCORPORATION_VS_COMMENCEMENT", "INFO", ["UDYAM"], _COMMENCE_RULE),
    ]
    return "\nUNION ALL\n".join(branches)


_VALIDATION_BODY = f"""WITH {_ENTITY_CTES},
val AS (
{_rules_union()}
)
SELECT entity_key, rule_id, status, message, severity, source_docs
FROM val"""


SQL_PIPELINE_VALIDATION = _VALIDATION_BODY

SQL_PIPELINE_ENTITY_REPORTS = f"""WITH v AS ({_VALIDATION_BODY})
SELECT entity_key,
  count(*) AS total_rules,
  count(CASE WHEN status = 'PASS' THEN 1 END) AS passed,
  count(CASE WHEN status = 'FAIL' THEN 1 END) AS failed,
  count(CASE WHEN status = 'WARNING' THEN 1 END) AS warnings,
  count(CASE WHEN status = 'SKIPPED' THEN 1 END) AS skipped,
  count(CASE WHEN status = 'FAIL' AND severity = 'CRITICAL' THEN 1 END)
    AS critical_failures,
  CASE
    WHEN count(CASE WHEN status = 'FAIL' AND severity = 'CRITICAL' THEN 1 END) > 0
      THEN 'FAILED (Critical issues found)'
    WHEN count(CASE WHEN status = 'FAIL' THEN 1 END) > 0 THEN 'FAILED'
    WHEN count(CASE WHEN status = 'WARNING' THEN 1 END) > 0
      THEN 'PASSED WITH WARNINGS'
    ELSE 'PASSED' END AS overall_status,
  CASE WHEN count(*) > 0 THEN
    printf('%.1f', count(CASE WHEN status = 'PASS' THEN 1 END) * 100.0
                   / count(*)) || '%'
  ELSE 'N/A' END AS pass_rate
FROM v GROUP BY entity_key"""


# ---------------------------------------------------------------------------
# Extraction surface + cross-doc checks + lineage + host stats + media
# ---------------------------------------------------------------------------

SQL_PIPELINE_EXTRACTIONS = f"""
SELECT url, doc_status, source_leg, document_type, missing_fields,
       entity_pan, entity_gstin, entity_udyam, entity_name, entity_date,
       entity_pin, blocks_kept, blocks_dropped, error
FROM {TWIN}
"""

#: per-block Readability/Boilerpipe scoring rows (serial-oracle twin of
#: the Spark mapInPandas pass — same leg gate, same block parser).
SQL_PIPELINE_BLOCK_SCORES = f"""
SELECT url, block_idx, n_lines, n_chars, link_chars, link_density,
       boilerplate, kept, text_md5
FROM {TWIN_BLOCKS}
"""

# Extractor shadow audit: the blast radius of a TIGHTENED link-density
# threshold (0.33 -> 0.25), reconstructed purely from the per-block
# contract columns — keep@B = kept AND link_density <= B holds exactly
# for any B below the deployed threshold, because the other keep
# conjuncts (boilerplate, min-chars) are threshold-independent.
SQL_EXTRACTOR_SHADOW_AUDIT = f"""
WITH pu AS (SELECT url,
              sum(CAST(kept AS INT)) AS kept_a,
              sum(CAST(kept AND link_density <= 0.25 AS INT)) AS kept_b
            FROM {TWIN_BLOCKS} GROUP BY 1)
SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS host,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN kept_a <> kept_b THEN 1 ELSE 0 END) AS BIGINT)
    AS n_changed,
  CAST(sum(kept_a - kept_b) AS BIGINT) AS blocks_dropped,
  CAST(sum(CASE WHEN kept_a <> kept_b THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*) AS change_rate
FROM pu GROUP BY 1
"""


SQL_PIPELINE_DUPLICATE_IDS = f"""
WITH docs AS (
  SELECT entity_pan AS pan, {_norm_name('entity_name')} AS name
  FROM {TWIN} WHERE entity_pan <> ''
)
SELECT pan, count(*) AS n_docs,
  count(DISTINCT CASE WHEN name <> '' THEN name END) AS n_names,
  coalesce(string_agg(DISTINCT CASE WHEN name <> '' THEN name END, ','
           ORDER BY CASE WHEN name <> '' THEN name END), '') AS names,
  count(DISTINCT CASE WHEN name <> '' THEN name END) > 1 AS is_conflict
FROM docs GROUP BY pan
"""

SQL_PIPELINE_CHECKSUM_CHECKS = f"""
WITH gst AS (
  SELECT url AS gst_url, entity_gstin AS gstin,
         upper(substr(entity_gstin, 3, 10)) AS derived_pan
  FROM {TWIN}
  WHERE document_type = 'GST_CERTIFICATE' AND entity_gstin <> ''
),
pans AS (SELECT DISTINCT entity_pan AS pan FROM {TWIN}
         WHERE document_type = 'PAN' AND entity_pan <> '')
SELECT g.gst_url, g.gstin, g.derived_pan,
       (p.pan IS NOT NULL) AS pan_doc_exists
FROM gst g LEFT JOIN pans p ON g.derived_pan = p.pan
"""

_N_MISSING = ("CASE WHEN missing_fields = '' THEN 0 ELSE "
              "length(missing_fields) - length(replace(missing_fields, ',', '')) + 1 END")

SQL_PIPELINE_LINEAGE_METRICS = f"""
SELECT source_leg, doc_status, count(*) AS docs,
  CAST(sum(blocks_kept) AS BIGINT) AS blocks_kept,
  CAST(sum(blocks_dropped) AS BIGINT) AS blocks_dropped,
  CAST(sum({_N_MISSING}) AS BIGINT) AS missing_field_hits
FROM {TWIN} GROUP BY 1, 2
"""

SQL_PIPELINE_HOST_STATS = f"""
SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
       count(*) AS n_docs
FROM {CORPUS} GROUP BY 1
"""

#: twin of curation.c4_span_dedup (X151) over the extraction twin:
#: sentences are maximal [^.!?]+[.!?]+ runs (trimmed); each duplicated
#: 3-sentence window keeps its first (url, pos) occurrence under the
#: same (binary-string url, pos) total order Spark's min(struct)
#: induces; non-owner occurrences' sentence positions strip.
SQL_PIPELINE_SPAN_DEDUP = f"""
WITH d AS (SELECT url, coalesce(extracted_text, '') AS t FROM {TWIN}),
s AS (SELECT url,
             list_transform(regexp_extract_all(t, '[^.!?]+[.!?]+'),
                            x -> trim(x)) AS sa
      FROM d),
sent AS (SELECT url, unnest(range(0, len(sa))) AS pos,
                unnest(sa) AS sent FROM s),
g0 AS (SELECT url, sa,
              unnest(range(1, greatest(len(sa) - 2, 0) + 1)) AS i
       FROM s),
occ AS (SELECT url, CAST(i - 1 AS INT) AS pos,
               md5(array_to_string(sa[i:i+2], ' ')) AS h
        FROM g0),
census AS (SELECT h, min(url) AS od FROM occ GROUP BY h
           HAVING count(*) >= 2),
own AS (SELECT o.h, c.od, min(o.pos) AS op
        FROM occ o JOIN census c ON o.h = c.h AND o.url = c.od
        GROUP BY o.h, c.od),
strip AS (SELECT DISTINCT o.url,
                 o.pos + unnest(range(0, 3)) AS spos
          FROM occ o JOIN own w ON o.h = w.h
          WHERE o.url <> w.od OR o.pos <> w.op),
kept AS (SELECT s.url, s.pos, s.sent FROM sent s
         WHERE NOT EXISTS (SELECT 1 FROM strip
                           WHERE strip.url = s.url
                             AND strip.spos = s.pos)),
agg AS (SELECT url, count(*) AS k,
               md5(string_agg(sent, ' ' ORDER BY pos)) AS hh
        FROM kept GROUP BY url),
tot AS (SELECT url, count(*) AS n FROM sent GROUP BY url)
SELECT d.url,
  CAST(coalesce(t.n, 0) AS BIGINT) AS n_sentences,
  CAST(coalesce(t.n, 0) - coalesce(a.k, 0) AS BIGINT)
    AS n_sentences_removed,
  coalesce(a.hh, md5('')) AS kept_text_hash
FROM d LEFT JOIN agg a ON d.url = a.url LEFT JOIN tot t ON d.url = t.url
"""


def _sql_encoding_damage() -> str:
    """Rendered lazily so the regex constants stay single-sourced in
    functions.text (twin of text.encoding_damage + the per-host
    rollup of queries.q_pipeline_encoding_damage)."""
    from .functions.text import MOJIBAKE_RE, REPLACEMENT_CHAR

    return f"""
WITH d AS (
  SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
    len(regexp_extract_all(coalesce(extracted_text, ''),
                           '{REPLACEMENT_CHAR}')) AS nr,
    len(regexp_extract_all(coalesce(extracted_text, ''),
                           '{MOJIBAKE_RE}')) AS nm
  FROM {TWIN})
SELECT host,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN nr + nm > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_damaged,
  CAST(sum(nr) AS BIGINT) AS n_replacement,
  CAST(sum(nm) AS BIGINT) AS n_mojibake,
  round(CAST(sum(CASE WHEN nr + nm > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        / count(*), 6) AS damage_rate
FROM d GROUP BY host
"""


SQL_PIPELINE_ENCODING_DAMAGE = _sql_encoding_damage()


def _sql_mojibake_repair() -> str:
    """Twin of queries.q_pipeline_mojibake_repair: the SAME 64-entry
    repair table renders to a nested DuckDB replace() chain (keys are
    audited quote/backslash-free), so cross-engine parity is by
    construction — one source of truth in functions.text.MOJIBAKE_MAP."""
    from .functions.text import MOJIBAKE_MAP, MOJIBAKE_RE

    rep = "t"
    for mangled, orig in MOJIBAKE_MAP:
        rep = f"replace({rep}, '{mangled}', '{orig}')"
    return f"""
WITH d AS (
  SELECT url, coalesce(extracted_text, '') AS t FROM {TWIN}),
f AS (
  SELECT url, t, {rep} AS ft FROM d),
r AS (
  SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
    CASE WHEN ft <> t THEN 1 ELSE 0 END AS chg,
    len(t) - len(ft) AS saved,
    len(regexp_extract_all(t, '{MOJIBAKE_RE}')) AS mb,
    len(regexp_extract_all(ft, '{MOJIBAKE_RE}')) AS ma,
    CAST(concat('0x', substr(md5(concat(url, ':', md5(ft))), 1, 15))
      AS BIGINT) AS h
  FROM f)
SELECT host,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(chg) AS BIGINT) AS n_repaired,
  CAST(sum(saved) AS BIGINT) AS chars_saved,
  CAST(sum(mb) AS BIGINT) AS n_mojibake_before,
  CAST(sum(ma) AS BIGINT) AS n_mojibake_after,
  CAST(CAST(sum(h) AS DECIMAL(38, 0)) AS VARCHAR) AS sum_h
FROM r GROUP BY host
"""


SQL_PIPELINE_MOJIBAKE_REPAIR = _sql_mojibake_repair()

SQL_MEDIA_METADATA = f"""
SELECT media_id, status, mime, n_bytes, sha1, width, height
FROM {TWIN_MEDIA}
"""

SQL_MEDIA_RESIZE = f"""
SELECT media_id, status, width AS orig_width, height AS orig_height,
       new_width, new_height, n_resized_bytes
FROM {TWIN_MEDIA}
"""

#: integer twin of multimodal.sample_frames' stride slicing:
#: n = min(max_frames, max(len,1)//stride + 1); bytes = min(len, n*stride)
SQL_MEDIA_FRAME_CENSUS = f"""
SELECT media_id,
  CAST(least(8, greatest(n_bytes, 1) // 4096 + 1) AS BIGINT) AS n_frames,
  CAST(least(n_bytes,
             least(8, greatest(n_bytes, 1) // 4096 + 1) * 4096) AS BIGINT)
    AS sampled_bytes
FROM {TWIN_MEDIA}
"""

SQL_MEDIA_CENSUS = f"""
SELECT mime, count(*) AS n_media,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       count(CASE WHEN status <> 'ok' THEN 1 END) AS n_errors
FROM {TWIN_MEDIA} GROUP BY mime
"""


# ---------------------------------------------------------------------------
# Legacy duplicate verification engine (verification.py:80-163)
# ---------------------------------------------------------------------------

def _legacy_nt(x: str) -> str:
    """`verification.py:10-12` — upper, strip [^A-Z0-9 ], trim ends;
    interior whitespace NOT collapsed (differs from _norm_name)."""
    return f"coalesce(trim(regexp_replace(upper({x}), '[^A-Z0-9 ]', '', 'g')), '')"


_LEGACY_ENTITY_CTES = f"""
res AS (SELECT * FROM {TWIN}),
lpan AS (
  SELECT url AS pan_url, upper(trim({_j('pan')})) AS pan,
         {_legacy_nt(_j('name'))} AS p_name
  FROM (SELECT url, CASE WHEN json_valid(fields_json) THEN fields_json END AS fj
        FROM res WHERE document_type = 'PAN')
  WHERE upper(trim({_j('pan')})) <> ''
  QUALIFY row_number() OVER (PARTITION BY upper(trim({_j('pan')}))
                             ORDER BY url) = 1
),
lgst AS (
  SELECT url AS gst_url,
         upper(trim(substr({_j('gst_number')}, 3, 10))) AS pan,
         {_legacy_nt(_j('name'))} AS g_name,
         {_legacy_nt("json_extract_string(fj, '$.principal_address.city')")} AS g_city,
         coalesce(json_extract_string(fj, '$.principal_address.pin_code'), '') AS g_pin
  FROM (SELECT url, CASE WHEN json_valid(fields_json) THEN fields_json END AS fj
        FROM res WHERE document_type = 'GST_CERTIFICATE')
  WHERE upper(trim(substr({_j('gst_number')}, 3, 10))) <> ''
  QUALIFY row_number() OVER (
      PARTITION BY upper(trim(substr({_j('gst_number')}, 3, 10)))
      ORDER BY url) = 1
),
ludyam AS (
  SELECT url AS udyam_url, upper(trim({_j('pan')})) AS pan,
         {_legacy_nt(_j('enterprise_name'))} AS u_name,
         {_j('incorporation_date')} AS u_inc,
         {_j('commencement_date')} AS u_com,
         {_legacy_nt("json_extract_string(fj, '$.official_address.city')")} AS u_city,
         coalesce(json_extract_string(fj, '$.official_address.pin'), '') AS u_pin
  FROM (SELECT url, CASE WHEN json_valid(fields_json) THEN fields_json END AS fj
        FROM res WHERE document_type = 'UDYAM')
  WHERE upper(trim({_j('pan')})) <> ''
  QUALIFY row_number() OVER (PARTITION BY upper(trim({_j('pan')}))
                             ORDER BY url) = 1
),
lent AS (
  SELECT coalesce(p.pan, g.pan, u.pan) AS entity_key,
    coalesce(p.pan, '') AS p_pan, coalesce(p.p_name, '') AS p_name,
    coalesce(g.pan, '') AS g_pan, coalesce(g.g_name, '') AS g_name,
    coalesce(g.g_city, '') AS g_city, coalesce(g.g_pin, '') AS g_pin,
    coalesce(u.pan, '') AS u_pan, coalesce(u.u_name, '') AS u_name,
    coalesce(u.u_inc, '') AS u_inc, coalesce(u.u_com, '') AS u_com,
    coalesce(u.u_city, '') AS u_city, coalesce(u.u_pin, '') AS u_pin
  FROM lpan p
  FULL JOIN lgst g ON p.pan = g.pan
  FULL JOIN ludyam u ON coalesce(p.pan, g.pan) = u.pan
)"""


def _legacy_name_rule(a: str, b: str, a_col: str, b_col: str) -> str:
    return (f"SELECT entity_key, 'NAME_MATCH_{a}_{b}' AS rule, "
            f"CASE WHEN {a_col} <> '' AND {a_col} = {b_col} "
            f"THEN 'PASS' ELSE 'FAIL' END AS status, "
            f"'{a} name vs {b} name' AS details FROM lent")


def _legacy_pan_rule(doc: str, other: str) -> str:
    return (f"SELECT entity_key, 'PAN_MATCH_PAN_{doc}' AS rule, "
            f"CASE WHEN p_pan <> '' AND p_pan = {other} "
            f"THEN 'PASS' ELSE 'FAIL' END AS status, "
            f"'PAN vs {doc} PAN' AS details FROM lent")


_LEGACY_SCORE = ("(CASE WHEN g_pin <> '' AND g_pin = u_pin THEN 1 ELSE 0 END"
                 " + CASE WHEN g_city <> '' AND g_city = u_city THEN 1 ELSE 0 END)")

SQL_PIPELINE_LEGACY_VERIFICATION = f"""WITH {_LEGACY_ENTITY_CTES}
{_legacy_name_rule('pan', 'gst', 'p_name', 'g_name')}
UNION ALL
{_legacy_name_rule('pan', 'udyam', 'p_name', 'u_name')}
UNION ALL
{_legacy_name_rule('gst', 'udyam', 'g_name', 'u_name')}
UNION ALL
{_legacy_pan_rule('gst', 'g_pan')}
UNION ALL
{_legacy_pan_rule('udyam', 'u_pan')}
UNION ALL
SELECT entity_key, 'GST_UDYAM_PRINCIPAL_ADDRESS_MATCH' AS rule,
  CASE WHEN {_LEGACY_SCORE} = 2 THEN 'PASS'
       WHEN {_LEGACY_SCORE} = 1 THEN 'WARNING' ELSE 'FAIL' END AS status,
  'Address match score: ' || CAST({_LEGACY_SCORE} AS VARCHAR) || '/2' AS details
FROM lent
UNION ALL
SELECT entity_key, 'INCORPORATION_VS_COMMENCEMENT' AS rule,
  CASE WHEN u_inc = u_com THEN 'WARNING' ELSE 'PASS' END AS status,
  'Same date indicates possible existing entity' AS details
FROM lent
"""


# ---------------------------------------------------------------------------
# URL canonicalization (functions/urlnorm.py) + corpus line dedup
# ---------------------------------------------------------------------------

from .functions.urlnorm import (  # noqa: E402  (pattern constants shared verbatim)
    URL_DOT_SEG_RE, URL_HTTP_80_RE, URL_HTTPS_443_RE, URL_INDEX_RE,
    URL_PREFIX_RE, URL_SLASH_RUN_RE, URL_TRACKING_PARAM_RE,
    URL_TRAILING_SLASH_RE,
)

_SQL_URL_PRE = f"regexp_extract(%s, '{URL_PREFIX_RE}', 1)"


def _sql_messy_url(url: str) -> str:
    """DuckDB twin of ``urlnorm.messy_variant`` (same md5-keyed classes)."""
    pre = _SQL_URL_PRE % url
    rest = f"substr({url}, len({pre}) + 1)"
    return (
        f"CASE WHEN substr(md5({url}), 1, 1) IN ('0','1','2','3') "
        f"THEN upper({pre}) || {rest} || '#frag-2' "
        f"WHEN substr(md5({url}), 1, 1) IN ('4','5','6','7') "
        f"THEN {pre} || ':443' || {rest} || "
        f"'?utm_source=feed&utm_campaign=x&gclid=z' "
        f"WHEN substr(md5({url}), 1, 1) IN ('8','9','a','b') "
        f"THEN {url} || '/.//index.html' "
        f"ELSE {url} || '?z=9&a=1&utm_medium=email&m=5' END")


def _sql_canon_ctes(src: str, keep: str = "") -> str:
    """CTE chain canonicalizing column ``raw`` of CTE/relation ``src``
    (twin of ``urlnorm.canonicalize_url``, stage for stage; RE2 ``\\1``
    replacement where the Spark side writes Java ``$1``). Ends in CTE
    ``canon_t(<keep,> raw, canon)``. ``keep``: comma-led passthrough
    columns, e.g. ``"url, "``."""
    return f"""c0 AS (SELECT {keep}raw, regexp_replace(raw, '#.*$', '') AS nf FROM {src}),
c1 AS (SELECT {keep}raw, nf, {_SQL_URL_PRE % 'nf'} AS pre0 FROM c0),
c2 AS (SELECT {keep}raw,
         regexp_replace(regexp_replace(lower(pre0),
           '{URL_HTTPS_443_RE}', '\\1'), '{URL_HTTP_80_RE}', '\\1') AS pre,
         substr(nf, len(pre0) + 1) AS rest FROM c1),
c3 AS (SELECT {keep}raw, pre,
         regexp_extract(rest, '^([^?]*)', 1) AS path0,
         regexp_extract(rest, '[?](.*)$', 1) AS q FROM c2),
c4 AS (SELECT {keep}raw, pre, q,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(path0, '{URL_SLASH_RUN_RE}', '/', 'g'),
           '{URL_DOT_SEG_RE}', '/', 'g'), '{URL_DOT_SEG_RE}', '/', 'g'),
           '{URL_INDEX_RE}', '/'), '{URL_TRAILING_SLASH_RE}', '\\1') AS path1
       FROM c3),
c5 AS (SELECT {keep}raw, pre,
         CASE WHEN path1 = '' THEN '/' ELSE path1 END AS path,
         coalesce(array_to_string(list_sort(list_filter(string_split(q, '&'),
           x -> len(x) > 0 AND NOT regexp_matches(x,
             '{URL_TRACKING_PARAM_RE}'))), '&'), '') AS qq
       FROM c4),
canon_t AS (SELECT {keep}raw,
         pre || path || CASE WHEN qq = '' THEN '' ELSE '?' || qq END AS canon
       FROM c5)"""


SQL_URL_CANONICALIZE = f"""
WITH u0 AS (SELECT url, {_sql_messy_url('url')} AS raw FROM {CORPUS}),
{_sql_canon_ctes('u0', 'url, ')}
SELECT url, raw AS messy_url, canon AS canon_url,
       (canon = url) AS roundtrip_ok
FROM canon_t
"""

def _sql_registrable_domains() -> str:
    """Twin of queries.q_registrable_domains — the host rewrite classes
    and BOTH suffix tables render from functions.urlnorm's bundled
    REAL Mozilla list slices, psl_full_levels() (single source: the
    same slices the Spark fast path broadcasts)."""
    from .functions.urlnorm import psl_full_levels

    full_two, full_one = psl_full_levels()
    two = ", ".join("'" + s + "'" for s in full_two)
    one = ", ".join("'" + s + "'" for s in full_one)
    return f"""
WITH h0 AS (SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS h
            FROM {CORPUS}),
k0 AS (SELECT h,
        CAST(concat('0x', substr(md5(h), 1, 4)) AS BIGINT) % 7 AS k
       FROM h0),
s0 AS (SELECT CASE k
          WHEN 0 THEN h
          WHEN 1 THEN replace(h, '.example.com', '.co.uk')
          WHEN 2 THEN replace(h, '.example.com', '.com.au')
          WHEN 3 THEN 'www.' || replace(h, '.example.com', '.org')
          WHEN 4 THEN 'a.b.' || h
          WHEN 5 THEN replace(h, '.example.com', '.github.io')
          ELSE replace(h, '.example.com', '.unlistedtld') END AS host
       FROM k0),
l0 AS (SELECT host,
        regexp_extract(host, '([^.]+)$', 1) AS l1,
        regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS l2 FROM s0),
m0 AS (SELECT host,
        CASE WHEN l2 IN ({two}) THEN l2
             WHEN l1 IN ({one}) THEN l1 ELSE l1 END AS public_suffix,
        CASE WHEN l2 IN ({two})
             THEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1)
             ELSE l2 END AS reg_domain
       FROM l0)
SELECT reg_domain, public_suffix,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
FROM m0 GROUP BY reg_domain, public_suffix
"""


SQL_REGISTRABLE_DOMAINS = _sql_registrable_domains()


def _sql_psl_domains() -> str:
    """Twin of queries.q_psl_domains — full PSL wildcard/exception
    longest-match over the REAL bundled Mozilla list (9,506 rules).
    The rule sets and the md5 host-rewrite gate render from
    functions.urlnorm.psl_full_rules (single source — the same parse
    the Spark matcher broadcasts); the matching logic is re-derived
    independently over DuckDB list ops. The rendered IN-lists carry
    the full cardinality (~140 KB of SQL) — DuckDB folds each into a
    hash filter, so the twin stays sub-second at oracle scale."""
    from .functions.urlnorm import psl_full_rules

    rows = list(psl_full_rules())
    max_l = max(r[1] for r in rows)
    need = max_l + 2

    def inlist(kind: str, nlab: int) -> str:
        vals = [r[0] for r in rows if r[2] == kind and r[1] == nlab]
        return ", ".join(f"'{v}'" for v in vals)

    tails = ",\n        ".join(
        f"CASE WHEN nlab >= {L} THEN "
        f"array_to_string(parts[nlab-{L}+1:nlab], '.') END AS t{L}"
        for L in range(1, need + 1))
    clauses = []
    for L in range(max_l, 1, -1):
        lst = inlist("e", L)
        if lst:
            clauses.append(f"WHEN t{L} IN ({lst}) THEN {L - 1}")
    for eff in range(max_l + 1, 0, -1):
        wl = inlist("w", eff - 1)
        if wl:
            clauses.append(
                f"WHEN t{eff - 1} IN ({wl}) AND nlab >= {eff} "
                f"THEN {eff}")
        nl = inlist("n", eff)
        if nl:
            clauses.append(f"WHEN t{eff} IN ({nl}) THEN {eff}")
    ps_lab = "CASE " + " ".join(clauses) + " ELSE 1 END"
    pick = lambda v: ("CASE " + v + " " + " ".join(
        f"WHEN {L} THEN t{L}" for L in range(1, need + 1)) + " END")
    return f"""
WITH h0 AS (SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS h
            FROM {CORPUS}),
k0 AS (SELECT h,
        CAST(concat('0x', substr(md5(h), 1, 4)) AS BIGINT) % 10 AS k
       FROM h0),
s0 AS (SELECT CASE k
          WHEN 0 THEN h
          WHEN 1 THEN replace(h, '.example.com', '.ck')
          WHEN 2 THEN 'a.' || replace(h, '.example.com', '.ck')
          WHEN 3 THEN 'www.ck'
          WHEN 4 THEN replace(h, '.example.com', '.kawasaki.jp')
          WHEN 5 THEN 'x.' || replace(h, '.example.com', '.kawasaki.jp')
          WHEN 6 THEN 'city.kawasaki.jp'
          WHEN 7 THEN 'w.city.kobe.jp'
          WHEN 8 THEN replace(h, '.example.com', '.github.io')
          ELSE replace(h, '.example.com', '.co.uk') END AS host
       FROM k0),
p0 AS (SELECT host, str_split(host, '.') AS parts,
              len(str_split(host, '.')) AS nlab FROM s0),
t0 AS (SELECT host, nlab,
        {tails}
       FROM p0),
m0 AS (SELECT host, nlab, {ps_lab} AS ps_lab,
        * EXCLUDE (host, nlab) FROM t0),
r0 AS (SELECT host,
        {pick('ps_lab')} AS public_suffix,
        CASE WHEN nlab > ps_lab THEN {pick('ps_lab + 1')} END AS reg_domain
       FROM m0)
SELECT reg_domain, public_suffix,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
FROM r0 GROUP BY reg_domain, public_suffix
"""


SQL_PSL_DOMAINS = _sql_psl_domains()

SQL_URL_DUP_GROUPS = f"""
WITH u0 AS (SELECT url AS raw FROM {CORPUS}
            UNION ALL SELECT {_sql_messy_url('url')} FROM {CORPUS}),
{_sql_canon_ctes('u0')}
SELECT canon AS canon_url, count(*) AS n_forms,
       count(DISTINCT raw) AS n_distinct_raw, min(raw) AS keep_url
FROM canon_t GROUP BY 1
"""

#: twin of curation.boilerplate_line_removal over the extraction twin:
#: global non-blank line census -> lines in >= 10 distinct docs dropped ->
#: per-doc reassembly in original order, hashed at the contract surface.
SQL_PIPELINE_LINE_DEDUP = f"""
WITH d AS (SELECT url, coalesce(extracted_text, '') AS t FROM {TWIN}),
s AS (SELECT url, string_split(t, chr(10)) AS ls FROM d),
l0 AS (SELECT url, unnest(ls) AS line,
              unnest(range(1, len(ls) + 1)) AS pos FROM s),
l AS (SELECT url, pos, line FROM l0 WHERE trim(line) <> ''),
common AS (SELECT line FROM l GROUP BY line
           HAVING count(DISTINCT url) >= 10),
kept AS (SELECT * FROM l WHERE line NOT IN (SELECT line FROM common)),
agg AS (SELECT url, count(*) AS k,
               md5(string_agg(line, chr(10) ORDER BY pos)) AS h
        FROM kept GROUP BY url),
tot AS (SELECT url, count(*) AS n FROM l GROUP BY url)
SELECT d.url,
  CAST(coalesce(a.k, 0) AS BIGINT) AS n_lines_kept,
  CAST(coalesce(t.n, 0) - coalesce(a.k, 0) AS BIGINT) AS n_lines_dropped,
  coalesce(a.h, md5('')) AS kept_text_hash
FROM d LEFT JOIN agg a ON d.url = a.url LEFT JOIN tot t ON d.url = t.url
"""

#: twin of curation.host_boilerplate_removal (X158) over the extraction
#: twin: within each host (>= 5 docs), lines in >= half of the host's
#: docs drop (exact-integer threshold nd*2 >= docs), survivors rebuilt
#: in original order and hashed.
SQL_PIPELINE_HOST_BOILERPLATE = f"""
WITH d AS (SELECT url, regexp_extract(url, 'https://([^/]+)/', 1) AS host,
                  coalesce(extracted_text, '') AS t FROM {TWIN}),
hd AS (SELECT host, count(*) AS docs FROM d GROUP BY host),
s AS (SELECT url, host, string_split(t, chr(10)) AS ls FROM d),
l0 AS (SELECT url, host, unnest(ls) AS line,
              unnest(range(1, len(ls) + 1)) AS pos FROM s),
l AS (SELECT url, host, pos, line FROM l0 WHERE trim(line) <> ''),
census AS (SELECT host, line, count(DISTINCT url) AS nd
           FROM l GROUP BY host, line),
drop0 AS (SELECT census.host, line FROM census
          JOIN hd ON census.host = hd.host
          WHERE nd * 2 >= docs AND docs >= 5),
kept AS (SELECT l.url, l.pos, l.line FROM l
         ANTI JOIN drop0 ON l.host = drop0.host AND l.line = drop0.line),
agg AS (SELECT url, count(*) AS k,
               md5(string_agg(line, chr(10) ORDER BY pos)) AS h
        FROM kept GROUP BY url),
tot AS (SELECT url, count(*) AS n FROM l GROUP BY url)
SELECT d.url, d.host,
  CAST(coalesce(a.k, 0) AS BIGINT) AS n_lines_kept,
  CAST(coalesce(t.n, 0) - coalesce(a.k, 0) AS BIGINT) AS n_lines_dropped,
  coalesce(a.h, md5('')) AS kept_text_hash
FROM d LEFT JOIN agg a ON d.url = a.url LEFT JOIN tot t ON d.url = t.url
"""

#: twin of curation.keep_first_line_dedup (X144) over the extraction twin:
#: each distinct non-blank line is owned by its first (url, pos) occurrence
#: (row_number over the same total order Spark's min(struct(url, pos))
#: induces — url comparison is binary in both engines); only owners are
#: kept, reassembled in original order, hashed at the contract surface.
SQL_PIPELINE_PARAGRAPH_DEDUP = f"""
WITH d AS (SELECT url, coalesce(extracted_text, '') AS t FROM {TWIN}),
s AS (SELECT url, string_split(t, chr(10)) AS ls FROM d),
l0 AS (SELECT url, unnest(ls) AS line,
              unnest(range(1, len(ls) + 1)) AS pos FROM s),
l AS (SELECT url, pos, line FROM l0 WHERE trim(line) <> ''),
kept AS (SELECT url, pos, line FROM (
           SELECT url, pos, line,
                  row_number() OVER (PARTITION BY line
                                     ORDER BY url, pos) AS rn
           FROM l) WHERE rn = 1),
agg AS (SELECT url, count(*) AS k,
               md5(string_agg(line, chr(10) ORDER BY pos)) AS h
        FROM kept GROUP BY url),
tot AS (SELECT url, count(*) AS n FROM l GROUP BY url)
SELECT d.url,
  CAST(coalesce(a.k, 0) AS BIGINT) AS n_lines_kept,
  CAST(coalesce(t.n, 0) - coalesce(a.k, 0) AS BIGINT) AS n_lines_dropped,
  coalesce(a.h, md5('')) AS kept_text_hash
FROM d LEFT JOIN agg a ON d.url = a.url LEFT JOIN tot t ON d.url = t.url
"""


# ---------------------------------------------------------------------------
# Link graph (functions/links.py): anchors, host graph, PageRank
# ---------------------------------------------------------------------------

from .functions.links import (  # noqa: E402
    ABS_URL_RE,
    ERROR_PAGE_RE,
    HREF_ANCHOR_RE,
    META_REFRESH_RE,
    PARKED_RE,
)

#: HTML sniff, DuckDB twin of links.HTML_SNIFF_RE. DuckDB renders a BLOB
#: cast to VARCHAR with non-printable bytes escaped as '\xHH', so BOM and
#: CR/LF/TAB are matched in their escaped spelling; the doctype/<html
#: alternation and case-insensitivity mirror the Spark regex exactly.
_SQL_HTML_SNIFF = (
    r"regexp_matches(CAST(html AS VARCHAR), "
    r"'^(?i)(\\xEF\\xBB\\xBF)?( |\\x09|\\x0A|\\x0D)*"
    r"(<!doctype( |\\x09|\\x0A|\\x0D)+html|<html)')")

#: decoded page or '' — the CASE keeps DuckDB's (throwing) decode() away
#: from poison payloads, mirroring the Spark sniff-gated CASE.
_SQL_PAGE = (f"CASE WHEN {_SQL_HTML_SNIFF} "
             "THEN decode(html) ELSE '' END")

_SQL_LINK_BASE = f"""
p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS}),
m AS (SELECT url, unnest(regexp_extract_all(page, '{HREF_ANCHOR_RE}', 0)) AS a
      FROM p),
lx AS (SELECT url AS src_url,
              regexp_extract(a, '{HREF_ANCHOR_RE}', 1) AS href,
              regexp_extract(a, '{HREF_ANCHOR_RE}', 2) AS anchor_text,
              {_SQL_URL_PRE % 'url'} AS pre
       FROM m),
links_t AS (SELECT src_url, anchor_text,
         CASE WHEN regexp_matches(href, '{ABS_URL_RE}') THEN href
              WHEN href LIKE '/%' THEN pre || href
              ELSE pre || '/' || href END AS dst_url
       FROM lx)"""

SQL_LINK_EDGES = f"""
WITH {_SQL_LINK_BASE}
SELECT src_url, dst_url, anchor_text FROM links_t
"""

#: twin of queries.q_host_template_census (X159): tag-skeleton census
#: from the sniff-gated decode; dominant-template tie -> min(skeleton).
SQL_HOST_TEMPLATE_CENSUS = f"""
WITH p0 AS (SELECT url, regexp_extract(url, 'https://([^/]+)/', 1) AS host,
                   {_SQL_PAGE} AS page FROM {CORPUS}),
sk AS (SELECT host,
        md5(array_to_string(
          regexp_extract_all(lower(page), '<(/?[a-z][a-z0-9]*)', 1),
          '>')) AS skeleton,
        len(regexp_extract_all(lower(page), '<(/?[a-z][a-z0-9]*)', 1))
          AS n_tags
       FROM p0),
d AS (SELECT host, skeleton FROM sk WHERE n_tags > 0),
cen AS (SELECT host, skeleton, count(*) AS n_pages
        FROM d GROUP BY host, skeleton),
a1 AS (SELECT host, CAST(count(*) AS BIGINT) AS n_templates,
              CAST(sum(n_pages) AS BIGINT) AS n_html_pages,
              max(n_pages) AS top
       FROM cen GROUP BY host),
tp AS (SELECT cen.host, min(skeleton) AS top_skeleton
       FROM cen JOIN a1 ON cen.host = a1.host AND cen.n_pages = a1.top
       GROUP BY cen.host)
SELECT a1.host, n_html_pages, n_templates,
       CAST(top AS BIGINT) AS top_pages, top_skeleton
FROM a1 JOIN tp ON a1.host = tp.host
"""

SQL_HOST_LINK_GRAPH = f"""
WITH {_SQL_LINK_BASE}
SELECT {_SQL_URL_PRE % 'src_url'} AS src_site,
       {_SQL_URL_PRE % 'dst_url'} AS dst_site,
       count(*) AS n_links
FROM links_t GROUP BY 1, 2
"""


SQL_ANCHOR_TEXT_PROFILE = f"""
WITH {_SQL_LINK_BASE},
counts AS (SELECT {_SQL_URL_PRE % 'dst_url'} AS dst_site, anchor_text,
                  CAST(count(*) AS BIGINT) AS n_links
           FROM links_t WHERE anchor_text <> '' GROUP BY 1, 2)
SELECT dst_site, anchor_text, n_links, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY dst_site
             ORDER BY n_links DESC, anchor_text) AS rank
  FROM counts) WHERE rank <= 3
"""


def _sql_outlink(off: int) -> str:
    """Deterministic synthetic cross-host outlink (md5 hex slice -> host
    index mod 24) — twin of ``queries._synth_outlink``."""
    return ("'https://host' || lpad(CAST(CAST(concat('0x', "
            f"substr(md5(url), {off}, 6)) AS BIGINT) %% 24 AS VARCHAR), "
            "2, '0') || '.example.com'").replace("%%", "%")


def _sql_pagerank_iters(iters: int, base_sql: str | None = None) -> str:
    """Chained per-iteration CTEs r1..r{iters}; each = ordered-list fold
    of inbound contributions (bit-exact twin of links._det_sum).
    ``base_sql`` overrides the classic ``(1-d)/N`` teleport term — the
    TrustRank twin passes ``(1-d) * tele(node)``."""
    d = "CAST(0.85 AS DOUBLE)"
    zero = "CAST(0.0 AS DOUBLE)"
    base = base_sql or f"(CAST(1.0 AS DOUBLE) - {d}) / nn.n"
    ctes = []
    for k in range(1, iters + 1):
        ctes.append(
            f"c{k} AS (SELECT f.dst, list(r.rank * f.f ORDER BY f.src) AS cs\n"
            f"       FROM frac f JOIN r{k-1} r ON f.src = r.node GROUP BY f.dst),\n"
            f"r{k} AS (SELECT nodes.node,\n"
            f"         {base} + {d} *\n"
            f"         coalesce(list_reduce(list_prepend({zero}, c{k}.cs),\n"
            f"                              (a, b) -> a + b), {zero}) AS rank\n"
            f"       FROM nodes CROSS JOIN nn\n"
            f"       LEFT JOIN c{k} ON nodes.node = c{k}.dst)")
    return ",\n".join(ctes)


SQL_URL_FEATURES = f"""
SELECT url,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
                      '\\.([a-z0-9-]+)$', 1) AS tld,
       CAST(len(list_filter(string_split(
            regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1), '/'),
            x -> x <> '')) AS BIGINT) AS path_depth,
       CAST(CASE WHEN regexp_extract(url, '\\?([^#]*)', 1) = '' THEN 0
                 ELSE len(string_split(
                      regexp_extract(url, '\\?([^#]*)', 1), '&'))
            END AS BIGINT) AS n_query_params,
       regexp_matches(regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1),
                      '[0-9]') AS digit_in_path,
       CAST(length(url) AS BIGINT) AS url_len
FROM {CORPUS}
"""

SQL_HOST_COMPONENTS = f"""
WITH RECURSIVE
e0 AS (SELECT DISTINCT {_SQL_URL_PRE % 'url'} AS s, {_sql_outlink(9)} AS d
       FROM {CORPUS}
       UNION
       SELECT DISTINCT {_SQL_URL_PRE % 'url'}, {_sql_outlink(17)}
       FROM {CORPUS}),
edges AS (SELECT s, d FROM e0 UNION SELECT d, s FROM e0),
reach(src, node) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges e ON r.node = e.s),
cc AS (SELECT src AS host, min(node) AS component FROM reach GROUP BY src)
SELECT host, component, (host = component) AS is_root FROM cc
"""

SQL_HOST_PAGERANK = f"""
WITH e0 AS (SELECT {_SQL_URL_PRE % 'url'} AS src, {_sql_outlink(9)} AS dst
            FROM {CORPUS}
            UNION ALL
            SELECT {_SQL_URL_PRE % 'url'}, {_sql_outlink(17)} FROM {CORPUS}),
edges AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
          FROM e0 GROUP BY 1, 2),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
frac AS (SELECT e.src, e.dst, e.w / o.ow AS f
         FROM edges e JOIN outw o ON e.src = o.src),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank
       FROM nodes CROSS JOIN nn),
{_sql_pagerank_iters(3)}
SELECT node AS host, rank FROM r3
"""

def _sql_hits_iters(iters: int) -> str:
    """Chained a{k}/h{k} CTEs for the exact-integer HITS iteration —
    twin of ``links.hits``. HUGEINT (int128) carries the path counts
    that Spark holds as DECIMAL(38,0); integer sums are
    order-independent, so no ordered folds are needed."""
    ctes = []
    for k in range(1, iters + 1):
        prev_hub = "h0" if k == 1 else f"h{k-1}"
        ctes.append(
            f"ai{k} AS (SELECT e.dst AS node, sum(h.hub) AS v\n"
            f"        FROM edges e JOIN {prev_hub} h ON e.src = h.node"
            " GROUP BY 1),\n"
            f"a{k} AS (SELECT nodes.node,"
            f" coalesce(ai{k}.v, CAST(0 AS HUGEINT)) AS auth\n"
            f"        FROM nodes LEFT JOIN ai{k} USING (node)),\n"
            f"hi{k} AS (SELECT e.src AS node, sum(a.auth) AS v\n"
            f"        FROM edges e JOIN a{k} a ON e.dst = a.node"
            " GROUP BY 1),\n"
            f"h{k} AS (SELECT nodes.node,"
            f" coalesce(hi{k}.v, CAST(0 AS HUGEINT)) AS hub\n"
            f"        FROM nodes LEFT JOIN hi{k} USING (node))")
    return ",\n".join(ctes)


SQL_HOST_HITS = f"""
WITH e0 AS (SELECT {_SQL_URL_PRE % 'url'} AS src, {_sql_outlink(9)} AS dst
            FROM {CORPUS}
            UNION ALL
            SELECT {_SQL_URL_PRE % 'url'}, {_sql_outlink(17)} FROM {CORPUS}),
edges AS (SELECT DISTINCT src, dst FROM e0),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
h0 AS (SELECT node, CAST(1 AS HUGEINT) AS hub FROM nodes),
{_sql_hits_iters(2)},
ta AS (SELECT sum(auth) AS t FROM a2),
th AS (SELECT sum(hub) AS t FROM h2)
SELECT a2.node AS host,
       CAST(a2.auth AS DOUBLE) / CAST(ta.t AS DOUBLE) AS authority,
       CAST(h2.hub AS DOUBLE) / CAST(th.t AS DOUBLE) AS hub
FROM a2 JOIN h2 USING (node) CROSS JOIN ta CROSS JOIN th
"""


_SQL_SYNTH_EDGES = (
    f"e0 AS (SELECT {_SQL_URL_PRE % 'url'} AS src, {_sql_outlink(9)} AS dst\n"
    f"       FROM {CORPUS}\n"
    f"       UNION ALL\n"
    f"       SELECT {_SQL_URL_PRE % 'url'}, {_sql_outlink(17)} FROM {CORPUS})")

# twin of links.triangle_stats over the synthetic cross-host graph:
# same (degree, node)-ordered edge orientation, wedge join, exact-once
# triangle close, per-node explode; coefficient = 2.0 * T first, then
# one correctly-rounded division (op order matches the Spark side).
SQL_HOST_TRIANGLES = f"""
WITH {_SQL_SYNTH_EDGES},
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM e0 WHERE src <> dst),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
        GROUP BY 1),
ori AS (SELECT CASE WHEN da.degree < db.degree
                      OR (da.degree = db.degree AND u.a < u.b)
                    THEN u.a ELSE u.b END AS u,
               CASE WHEN da.degree < db.degree
                      OR (da.degree = db.degree AND u.a < u.b)
                    THEN u.b ELSE u.a END AS v,
               CASE WHEN da.degree < db.degree
                      OR (da.degree = db.degree AND u.a < u.b)
                    THEN db.degree ELSE da.degree END AS dv
        FROM und u JOIN deg da ON u.a = da.node
                   JOIN deg db ON u.b = db.node),
wed AS (SELECT e1.u, e1.v AS v1, e2.v AS v2
        FROM ori e1 JOIN ori e2 ON e1.u = e2.u
        WHERE e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v)),
tri AS (SELECT w.u, w.v1, w.v2
        FROM wed w JOIN ori o ON o.u = w.v1 AND o.v = w.v2),
tn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
       FROM (SELECT u AS node FROM tri UNION ALL SELECT v1 FROM tri
             UNION ALL SELECT v2 FROM tri) GROUP BY 1)
SELECT d.node AS host, d.degree,
       coalesce(tn.n_triangles, 0) AS n_triangles,
       CASE WHEN d.degree >= 2 THEN
         round(2.0 * coalesce(tn.n_triangles, 0)
               / CAST(d.degree * (d.degree - 1) AS DOUBLE), 6)
       ELSE 0.0 END AS clustering
FROM deg d LEFT JOIN tn ON d.node = tn.node
"""

# twin of links.cocitation_pairs (max_fanin=1000): out-degrees fold
# over the cap-surviving edge list so the Jaccard is self-consistent.
SQL_HOST_COCITATION = f"""
WITH {_SQL_SYNTH_EDGES},
e AS (SELECT DISTINCT src, dst FROM e0),
ee AS (SELECT * FROM e WHERE dst NOT IN
        (SELECT dst FROM e GROUP BY dst HAVING count(*) > 1000)),
outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_d
           FROM ee GROUP BY 1),
common AS (SELECT x.src AS host_a, y.src AS host_b,
                  CAST(count(*) AS BIGINT) AS common_dsts
           FROM ee x JOIN ee y ON x.dst = y.dst AND x.src < y.src
           GROUP BY 1, 2)
SELECT c.host_a, c.host_b, c.common_dsts,
       da.out_d AS out_a, db.out_d AS out_b,
       round(CAST(c.common_dsts AS DOUBLE)
             / CAST(da.out_d + db.out_d - c.common_dsts AS DOUBLE), 6)
         AS jaccard
FROM common c JOIN outdeg da ON c.host_a = da.src
              JOIN outdeg db ON c.host_b = db.src
"""


#: trusted seed hosts for the TrustRank contract query (two synthetic
#: outlink hubs — shared verbatim between the Spark call and the twin).
TRUST_SEEDS = ("https://host00.example.com", "https://host07.example.com")

_SQL_TELE = ("CASE WHEN nodes.node IN ("
             + ", ".join(f"'{s}'" for s in TRUST_SEEDS)
             + f") THEN CAST(1.0 AS DOUBLE) / CAST({len(TRUST_SEEDS)}.0"
             " AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END")

SQL_HOST_TRUSTRANK = f"""
WITH e0 AS (SELECT {_SQL_URL_PRE % 'url'} AS src, {_sql_outlink(9)} AS dst
            FROM {CORPUS}
            UNION ALL
            SELECT {_SQL_URL_PRE % 'url'}, {_sql_outlink(17)} FROM {CORPUS}),
edges AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
          FROM e0 GROUP BY 1, 2),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
frac AS (SELECT e.src, e.dst, e.w / o.ow AS f
         FROM edges e JOIN outw o ON e.src = o.src),
r0 AS (SELECT nodes.node, {_SQL_TELE} AS rank FROM nodes),
{_sql_pagerank_iters(3, base_sql=f"(CAST(1.0 AS DOUBLE)"
                     f" - CAST(0.85 AS DOUBLE)) * ({_SQL_TELE})")}
SELECT node AS host, rank FROM r3
"""

#: latest capture per canonical URL: clean crawl + deterministic messy
#: recrawl 1h later, grouped on the canonical form.
SQL_LATEST_CAPTURE = f"""
WITH caps AS (SELECT url AS raw, warc_ts AS ts FROM {CORPUS}
              UNION ALL
              SELECT {_sql_messy_url('url')}, warc_ts + INTERVAL 1 HOUR
              FROM {CORPUS}),
{_sql_canon_ctes('caps', 'ts, ')}
SELECT canon AS canon_url, CAST(count(*) AS BIGINT) AS n_captures,
       max(ts) AS latest_ts, arg_max(raw, ts) AS latest_url
FROM canon_t GROUP BY 1
"""

#: crawl snapshot delta: the recrawl is derived deterministically from
#: the corpus by md5(url) bucket — b<5 removed, 5<=b<20 content-mutated,
#: b>=90 spawns an added '?page=2' capture. Content identity over BINARY
#: is md5(to_base64(html)) — the Spark side strips base64 MIME newlines
#: so both engines hash the same string (functions/delta.py).
SQL_SNAPSHOT_DELTA = f"""
WITH c AS (SELECT url, html FROM {CORPUS}),
bkt AS (SELECT url, html,
               CAST(concat('0x', substr(md5(url), 1, 4)) AS BIGINT) % 100
               AS b
        FROM c),
recrawl AS (
  SELECT url,
         CASE WHEN b < 20 THEN html || '<!--rev2-->'::BLOB
              ELSE html END AS html
  FROM bkt WHERE b >= 5
  UNION ALL
  SELECT url || '?page=2' AS url, html || '<!--p2-->'::BLOB AS html
  FROM bkt WHERE b >= 90),
a AS (SELECT url, md5(to_base64(html)) AS h_old FROM c),
bn AS (SELECT url, md5(to_base64(html)) AS h_new FROM recrawl),
d AS (SELECT coalesce(a.url, bn.url) AS url,
             CASE WHEN a.url IS NULL THEN 'added'
                  WHEN bn.url IS NULL THEN 'removed'
                  WHEN h_old = h_new THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM a FULL OUTER JOIN bn ON a.url = bn.url),
h AS (SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
             status
      FROM d)
SELECT host,
  CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_added,
  CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_removed,
  CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_changed,
  CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unchanged,
  CASE WHEN sum(CASE WHEN status IN ('changed', 'unchanged')
                     THEN 1 ELSE 0 END) > 0
       THEN CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)
                 AS DOUBLE)
            / CAST(sum(CASE WHEN status IN ('changed', 'unchanged')
                            THEN 1 ELSE 0 END) AS DOUBLE)
       ELSE 0.0 END AS change_rate
FROM h GROUP BY 1
"""

# per-host change-frequency statistics over a deterministic 4-snapshot
# history (functions/delta.revisit_stats twin): cumulative md5-gated
# change events per step, consecutive-pair alignment via a (url, snap)
# self-join, integer cross-multiplied revisit buckets.
SQL_REVISIT_STATS = f"""
WITH c AS (SELECT url, md5(to_base64(html)) AS bh FROM {CORPUS}),
g AS (SELECT url, bh,
        CASE WHEN CAST(concat('0x', substr(md5(url || '#1'), 1, 4))
                  AS BIGINT) % 100 < 25 THEN 1 ELSE 0 END AS g1,
        CASE WHEN CAST(concat('0x', substr(md5(url || '#2'), 1, 4))
                  AS BIGINT) % 100 < 25 THEN 1 ELSE 0 END AS g2,
        CASE WHEN CAST(concat('0x', substr(md5(url || '#3'), 1, 4))
                  AS BIGINT) % 100 < 25 THEN 1 ELSE 0 END AS g3
      FROM c),
hist AS (SELECT url, s,
                md5(bh || ':' || CAST(
                    (CASE WHEN s >= 1 THEN g1 ELSE 0 END
                   + CASE WHEN s >= 2 THEN g2 ELSE 0 END
                   + CASE WHEN s >= 3 THEN g3 ELSE 0 END) AS VARCHAR))
                  AS h
         FROM g CROSS JOIN (SELECT unnest(range(0, 4)) AS s) snaps),
pairs AS (SELECT a.url, a.h AS h1, b.h AS h2
          FROM hist a JOIN hist b ON a.url = b.url AND b.s = a.s + 1),
per AS (SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
               CASE WHEN h1 <> h2 THEN 1 ELSE 0 END AS ch
        FROM pairs),
agg AS (SELECT host, CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(sum(ch) AS BIGINT) AS n_changed
        FROM per GROUP BY host)
SELECT host, n_intervals, n_changed,
       CAST(n_changed AS DOUBLE) / CAST(n_intervals AS DOUBLE)
         AS change_fraction,
       CASE WHEN n_changed * 2 >= n_intervals THEN 'fast'
            WHEN n_changed * 10 >= n_intervals THEN 'medium'
            WHEN n_changed > 0 THEN 'slow'
            ELSE 'static' END AS revisit_bucket
FROM agg
"""


#: per-host monthly crawl activity over the capture timestamps.
SQL_CRAWL_ACTIVITY = f"""
SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
       CAST(date_trunc('month', warc_ts) AS TIMESTAMP) AS month,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(CASE WHEN {_SQL_HTML_SNIFF}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_html,
       max(warc_ts) AS latest_ts
FROM {CORPUS} GROUP BY 1, 2
"""

#: WARC roundtrip twin: the oracle never parses WARC — it states what a
#: lossless write+parse of the corpus MUST return, straight from the
#: corpus parquet. Any framing/Content-Length/date-format defect in
#: sources/warc.py shows up as a hash mismatch here.
SQL_WARC_ROUNDTRIP = f"""
SELECT url, octet_length(html) AS n_bytes,
       md5(hex(html)) AS payload_hash,
       warc_ts, 'ok' AS status
FROM {CORPUS}
"""

# CDX index oracle: every byte offset reconstructed RELATIONALLY from
# the corpus parquet — legal because the writer is deterministic (md5
# bucket, url-sorted records, fixed template). record_len = 139 +
# strlen(url) + digits(payload_len) + payload_len (constant verified
# against sources/warc.record_bytes); offsets are the per-file
# url-ordered exclusive prefix sum. The Spark side parses the PHYSICAL
# files, so write/parse framing defects mismatch at the byte level.
SQL_CDX_INDEX = f"""
WITH r AS (SELECT url, warc_ts, html,
             CAST(concat('0x', substr(md5(url), 1, 8)) AS BIGINT) % 8
               AS b,
             octet_length(html) AS plen
           FROM {CORPUS}),
l AS (SELECT *, CAST(139 + strlen(url)
                 + strlen(CAST(plen AS VARCHAR)) + plen AS BIGINT)
               AS rlen FROM r),
o AS (SELECT *, CAST(coalesce(sum(rlen) OVER (
          PARTITION BY b ORDER BY url
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        AS BIGINT) AS off FROM l)
SELECT array_to_string(list_reverse(string_split(
         regexp_extract(url, 'https?://([^/]+)', 1), '.')), ',')
         || ')' || regexp_extract(url, 'https?://[^/]+(/.*)', 1)
       AS urlkey,
       url, warc_ts, md5(hex(html)) AS digest,
       printf('part-%05d.warc', b) AS warc_file,
       off AS rec_offset, rlen AS rec_length
FROM o
"""


#: per-page structural metadata (head profile) — patterns shared
#: verbatim with functions/links.py.
SQL_PAGE_METADATA = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS})
SELECT url,
  regexp_extract(page, '<title>([^<]*)</title>', 1) AS title,
  CAST(length(regexp_extract(page, '<title>([^<]*)</title>', 1))
       AS BIGINT) AS title_len,
  CAST(len(regexp_extract_all(page, '<a href=')) AS BIGINT) AS n_links,
  CAST(len(regexp_extract_all(page, '<script')) AS BIGINT) AS n_scripts,
  (len(regexp_extract_all(page, '<article class="main-content">')) > 0)
    AS has_main_content
FROM p
"""


_SQL_ROBOTS = ('lower(regexp_extract(page, '
               '\'(?i)<meta[^>]*name="robots"[^>]*content="([^"]*)"\', 1))')
_SQL_CANONICAL = ('regexp_extract(page, '
                  '\'(?i)<link[^>]*rel="canonical"[^>]*href="([^"]*)"\', 1)')

SQL_PAGE_DIRECTIVES = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS})
SELECT url,
  {_SQL_ROBOTS} AS robots,
  contains({_SQL_ROBOTS}, 'noindex') AS noindex,
  contains({_SQL_ROBOTS}, 'nofollow') AS nofollow,
  {_SQL_CANONICAL} AS canonical_url,
  CAST(len(regexp_extract_all(page,
    '(?is)<script type="application/ld\\+json">.*?</script>'))
    AS BIGINT) AS n_jsonld,
  regexp_extract(page,
    '(?is)<script type="application/ld\\+json">[^<]*"@type"\\s*:\\s*"([^"]*)"',
    1) AS jsonld_type,
  lower(regexp_extract(page, '(?i)<meta charset="([^"]*)"', 1))
    AS meta_charset
FROM p
"""


# soft-404 / parked-page verdicts (functions/links.soft404_flags):
# phrase patterns shared verbatim; error_page outranks parked.
SQL_SOFT404_FLAGS = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS})
SELECT url,
  regexp_extract(page, '<title>([^<]*)</title>', 1) AS title,
  regexp_matches(page, '{ERROR_PAGE_RE}') AS error_hit,
  regexp_matches(page, '{PARKED_RE}') AS parked_hit,
  CASE WHEN regexp_matches(page, '{ERROR_PAGE_RE}') THEN 'error_page'
       WHEN regexp_matches(page, '{PARKED_RE}') THEN 'parked'
       ELSE 'ok' END AS reason
FROM p
"""


# per-host soft-404 census (functions/links.host_error_rate): exact
# integer counts + ONE correctly-rounded IEEE division (no round()).
SQL_HOST_ERROR_RATE = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS}),
f AS (SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS host,
             CAST(regexp_matches(page, '{ERROR_PAGE_RE}') AS INT) AS e,
             CAST(regexp_matches(page, '{PARKED_RE}') AS INT) AS pk
      FROM p)
SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(e) AS BIGINT) AS n_error,
       CAST(sum(pk) AS BIGINT) AS n_parked,
       CAST(sum(CASE WHEN e = 1 OR pk = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS error_rate
FROM f GROUP BY host
"""


# meta-refresh redirect stubs (functions/links.meta_refresh_targets):
# pattern shared verbatim; delay -1 when the directive is absent.
SQL_META_REFRESH = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS})
SELECT url,
  CAST(CASE WHEN regexp_extract(page, '{META_REFRESH_RE}', 1) = ''
            THEN -1
            ELSE CAST(regexp_extract(page, '{META_REFRESH_RE}', 1)
                      AS BIGINT) END AS BIGINT) AS refresh_delay,
  regexp_extract(page, '{META_REFRESH_RE}', 2) AS refresh_target,
  regexp_extract(page, '{META_REFRESH_RE}', 2) <> '' AS is_redirect
FROM p
"""


# one-hop redirect resolve (functions/links.redirect_resolved): stub
# target probed against the corpus; a captured target's own stub flag
# marks chains.
SQL_REDIRECT_RESOLVED = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS}),
prof AS (SELECT url,
                regexp_extract(page, '{META_REFRESH_RE}', 2) AS tgt
         FROM p),
stubs AS (SELECT url, tgt AS target FROM prof WHERE tgt <> ''),
tprof AS (SELECT prof.url AS target, prof.tgt <> '' AS t_redir
          FROM prof JOIN (SELECT DISTINCT target FROM stubs) s
            ON prof.url = s.target)
SELECT st.url, st.target,
       tp.target IS NOT NULL AS target_captured,
       coalesce(tp.t_redir, FALSE) AS target_is_redirect
FROM stubs st LEFT JOIN tprof tp ON st.target = tp.target
"""


# charset-declaration census (functions/links.charset_census): BOM
# outranks the meta label; the BOM test matches DuckDB's escaped
# \\xHH rendering of the BLOB cast, exactly like _SQL_HTML_SNIFF.
SQL_CHARSET_CENSUS = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page, html FROM {CORPUS}),
s AS (SELECT
        CASE WHEN page = '' THEN 'not-html'
             WHEN regexp_matches(CAST(html AS VARCHAR),
                                 '^\\\\xEF\\\\xBB\\\\xBF') THEN 'bom-utf8'
             WHEN regexp_extract(page, '(?i)<meta charset="([^"]*)"', 1)
                  <> ''
               THEN lower(regexp_extract(page,
                          '(?i)<meta charset="([^"]*)"', 1))
             ELSE 'undeclared' END AS charset,
        regexp_extract(url, 'https?://([^/]+)', 1) AS h
      FROM p)
SELECT charset, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT h) AS BIGINT) AS n_hosts
FROM s GROUP BY charset
"""


# Structured-markup extraction twins (functions/structured.py). All
# regexes are shared verbatim with the Spark side (RE2-compatible:
# non-greedy + (?is), no lookaround); cell cleaning is the same
# tag-strip + trim, with DuckDB's 'g' flag standing in for Spark's
# always-global regexp_replace. Positions come from unnest(range(...))
# with 1-based list indexing, emitted 0-based to match posexplode.
_T_RE = r"(?is)<table[^>]*>(.*?)</table>"
_TR_RE = r"(?is)<tr[^>]*>(.*?)</tr>"
_CELL_RE = r"(?is)<t[dh][^>]*>(.*?)</t[dh]>"
_TAGSTRIP = r"<[^>]*>"
_ALT_TAG_RE = r'(?is)<link[^>]*rel="alternate"[^>]*>'
_HREFLANG_ATTR = r'(?is)hreflang="([^"]*)"'
_HREF_ATTR = r'(?is)href="([^"]*)"'
_HOST = "regexp_extract(url, 'https?://([^/]+)', 1)"


def _sql_clean_cells(rows_expr: str) -> str:
    """list of tag-stripped trimmed cell strings for one <tr> body."""
    return (f"list_transform(regexp_extract_all({rows_expr}, "
            f"'{_CELL_RE}', 1), c -> trim(regexp_replace(c, "
            f"'{_TAGSTRIP}', '', 'gs')))")


SQL_HTML_TABLES = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS}),
t AS (SELECT url, regexp_extract_all(page, '{_T_RE}', 1) AS ts FROM p),
ti AS (SELECT url, ts, unnest(range(1, len(ts) + 1)) AS tpos FROM t),
tr AS (SELECT url, tpos,
              regexp_extract_all(ts[tpos], '{_TR_RE}', 1) AS rs
       FROM ti),
ri AS (SELECT url, tpos, rs, unnest(range(1, len(rs) + 1)) AS rpos FROM tr)
SELECT url,
       CAST(tpos - 1 AS INTEGER) AS table_idx,
       CAST(rpos - 1 AS INTEGER) AS row_idx,
       regexp_matches(rs[rpos], '(?is)<th') AS is_header,
       {_sql_clean_cells('rs[rpos]')} AS cells,
       CAST(len(regexp_extract_all(rs[rpos], '{_CELL_RE}', 1))
            AS INTEGER) AS n_cells
FROM ri
"""


SQL_TABLE_RECORDS = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS}),
t AS (SELECT url, regexp_extract_all(page, '{_T_RE}', 1) AS ts FROM p),
ti AS (SELECT url, ts, unnest(range(1, len(ts) + 1)) AS tpos FROM t),
tr AS (SELECT url, tpos,
              regexp_extract_all(ts[tpos], '{_TR_RE}', 1) AS rs
       FROM ti),
h AS (SELECT url, tpos, rs, {_sql_clean_cells('rs[1]')} AS hdr FROM tr),
d AS (SELECT url, tpos, hdr, rs,
             unnest(range(2, len(rs) + 1)) AS rpos
      FROM h WHERE len(hdr) > 0),
cc AS (SELECT url, tpos, hdr, rpos,
              {_sql_clean_cells('rs[rpos]')} AS cells
       FROM d),
k AS (SELECT url, tpos, rpos, hdr, cells,
             unnest(range(1, greatest(len(hdr), len(cells)) + 1)) AS ki
      FROM cc)
SELECT url,
       CAST(tpos - 1 AS INTEGER) AS table_idx,
       CAST(rpos - 1 AS INTEGER) AS row_idx,
       hdr[ki] AS field, cells[ki] AS value
FROM k
"""


SQL_FILING_RECORDS = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS}),
t AS (SELECT url, regexp_extract_all(page, '{_T_RE}', 1) AS ts FROM p),
ti AS (SELECT url, ts, unnest(range(1, len(ts) + 1)) AS tpos FROM t),
tr AS (SELECT url, tpos,
              regexp_extract_all(ts[tpos], '{_TR_RE}', 1) AS rs
       FROM ti),
h AS (SELECT url, tpos, rs, {_sql_clean_cells('rs[1]')} AS hdr FROM tr),
d AS (SELECT url, tpos, hdr, rs,
             unnest(range(2, len(rs) + 1)) AS rpos
      FROM h WHERE len(hdr) > 0),
cc AS (SELECT url, tpos, hdr, rpos,
              {_sql_clean_cells('rs[rpos]')} AS cells
       FROM d),
k AS (SELECT url, tpos, rpos, hdr, cells,
             unnest(range(1, greatest(len(hdr), len(cells)) + 1)) AS ki
      FROM cc),
recs AS (SELECT url, CAST(tpos - 1 AS INTEGER) AS table_idx,
                CAST(rpos - 1 AS INTEGER) AS row_idx,
                hdr[ki] AS field, cells[ki] AS value
         FROM k),
w AS (SELECT url, table_idx, row_idx,
             max(CASE WHEN field = 'Sr' THEN value END) AS sr,
             max(CASE WHEN field = 'Filed' THEN value END) AS filed,
             max(CASE WHEN field = 'Status' THEN value END) AS status,
             max(CASE WHEN field = 'Fee' THEN value END) AS fee
      FROM recs WHERE field IN ('Sr', 'Filed', 'Status', 'Fee')
      GROUP BY 1, 2, 3)
SELECT url, table_idx, row_idx,
       TRY_CAST(sr AS INTEGER) AS sr,
       TRY_CAST(filed AS DATE) AS filed,
       status,
       TRY_CAST(fee AS BIGINT) AS fee
FROM w
"""


SQL_TABLE_CENSUS = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS}),
t AS (SELECT url, regexp_extract_all(page, '{_T_RE}', 1) AS ts FROM p),
s AS (SELECT {_HOST} AS host,
             CAST(len(ts) AS INTEGER) AS n_tables,
             CAST(coalesce(list_sum(list_transform(ts, tb ->
                 len(list_filter(regexp_extract_all(tb, '{_TR_RE}', 1),
                                 r -> NOT regexp_matches(r, '(?is)<th')))
             )), 0) AS BIGINT) AS ndr,
             CAST(coalesce(list_max(list_transform(ts, tb ->
                 coalesce(list_max(list_transform(
                     regexp_extract_all(tb, '{_TR_RE}', 1),
                     r -> len(regexp_extract_all(r, '{_CELL_RE}', 1)))), 0)
             )), 0) AS INTEGER) AS mc
      FROM t WHERE len(ts) > 0)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_pages_with_tables,
       CAST(sum(n_tables) AS BIGINT) AS n_tables,
       CAST(sum(ndr) AS BIGINT) AS n_data_rows,
       max(mc) AS max_cells
FROM s GROUP BY host
"""


SQL_TABLE_MARKDOWN = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS}),
t AS (SELECT url, regexp_extract_all(page, '{_T_RE}', 1) AS ts FROM p),
ti AS (SELECT url, ts, unnest(range(1, len(ts) + 1)) AS tpos FROM t),
tr AS (SELECT url, tpos,
              regexp_extract_all(ts[tpos], '{_TR_RE}', 1) AS rs
       FROM ti),
ri AS (SELECT url, tpos, rs, unnest(range(1, len(rs) + 1)) AS rpos FROM tr),
ln AS (SELECT url, tpos, rpos,
              '| ' || array_to_string(
                  list_transform({_sql_clean_cells('rs[rpos]')},
                                 c -> replace(c, '|', '\\|')),
                  ' | ') || ' |' AS line,
              len(regexp_extract_all(rs[rpos], '{_CELL_RE}', 1)) AS nc
       FROM ri),
g AS (SELECT url, CAST(tpos - 1 AS INTEGER) AS table_idx,
             min(CASE WHEN rpos = 1 THEN line END) AS hdr_line,
             CAST(min(CASE WHEN rpos = 1 THEN nc END) AS INTEGER)
               AS n_hdr,
             string_agg(CASE WHEN rpos > 1 THEN line END, chr(10)
                        ORDER BY rpos) AS body
      FROM ln GROUP BY url, tpos)
SELECT url, table_idx,
       hdr_line || chr(10) || '|' || repeat(' --- |', n_hdr)
       || CASE WHEN body IS NULL THEN '' ELSE chr(10) || body END
         AS markdown
FROM g
"""


#: training-export document form: TWIN extracted text + the page's
#: markdown-rendered tables (blank-line separated, table_idx order),
#: hashed at the contract surface.
SQL_PIPELINE_MARKDOWN_DOCS = f"""
WITH md AS ({SQL_TABLE_MARKDOWN}),
per AS (SELECT url, CAST(count(*) AS BIGINT) AS n_tables,
               string_agg(markdown, chr(10) || chr(10)
                          ORDER BY table_idx) AS tbl
        FROM md GROUP BY url)
SELECT t.url,
       CAST(coalesce(p.n_tables, 0) AS BIGINT) AS n_tables,
       md5(coalesce(t.extracted_text, '')
           || CASE WHEN p.tbl IS NULL THEN ''
                   ELSE chr(10) || chr(10) || p.tbl END)
         AS doc_markdown_hash
FROM {TWIN} t LEFT JOIN per p ON t.url = p.url
"""


SQL_FRONTIER_CANDIDATES_TEMPLATE = """
WITH {entries_base},
listed AS (SELECT host,
                  regexp_extract(en, '(?is)<loc>(.*?)</loc>', 1) AS loc
           FROM se),
crawled AS (SELECT url AS loc FROM {corpus}
            WHERE NOT regexp_matches(url, '/sitemap[^/]*\\.xml$')),
phantom AS (SELECT l.host, l.loc FROM listed l
            LEFT JOIN crawled c ON l.loc = c.loc
            WHERE c.loc IS NULL),
pri AS ({priorities})
SELECT ph.host, ph.loc,
       coalesce(pri.priority, CAST(0.0 AS DOUBLE)) AS priority
FROM phantom ph LEFT JOIN pri ON ph.host = pri.host
"""


SQL_HREFLANG_CLUSTERS = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS}),
s AS (SELECT url,
             regexp_extract_all(page, '{_ALT_TAG_RE}', 0) AS tags
      FROM p),
e AS (SELECT url,
             list_sort(list_transform(tags, t ->
                 regexp_extract(t, '{_HREF_ATTR}', 1))) AS hrefs,
             list_sort(list_transform(tags, t ->
                 regexp_extract(t, '{_HREFLANG_ATTR}', 1))) AS langs
      FROM s WHERE len(tags) > 0)
SELECT md5(array_to_string(hrefs, '|')) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_pages,
       min(url) AS first_url,
       min(array_to_string(langs, '|')) AS langs_key,
       CAST(max(len(hrefs)) AS INTEGER) AS n_langs
FROM e GROUP BY 1
"""


SQL_TABLE_COLUMN_PROFILE = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS}),
t AS (SELECT url, regexp_extract_all(page, '{_T_RE}', 1) AS ts FROM p),
ti AS (SELECT url, ts, unnest(range(1, len(ts) + 1)) AS tpos FROM t),
tr AS (SELECT url, tpos,
              regexp_extract_all(ts[tpos], '{_TR_RE}', 1) AS rs
       FROM ti),
h AS (SELECT url, tpos, rs, {_sql_clean_cells('rs[1]')} AS hdr FROM tr),
d AS (SELECT url, tpos, hdr, rs,
             unnest(range(2, len(rs) + 1)) AS rpos
      FROM h WHERE len(hdr) > 0),
cc AS (SELECT url, tpos, hdr, rpos,
              {_sql_clean_cells('rs[rpos]')} AS cells
       FROM d),
k AS (SELECT url, hdr, cells,
             unnest(range(1, greatest(len(hdr), len(cells)) + 1)) AS ki
      FROM cc),
recs AS (SELECT url, hdr[ki] AS field, cells[ki] AS value FROM k),
g AS (SELECT {_HOST} AS host, field,
             CAST(count(*) AS BIGINT) AS n_values,
             CAST(sum(CASE WHEN value IS NOT NULL AND value <> ''
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_nonempty,
             CAST(sum(CASE WHEN value IS NOT NULL AND value <> ''
                       AND regexp_matches(value, '^[0-9]+$')
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
             CAST(sum(CASE WHEN value IS NOT NULL AND value <> ''
                       AND regexp_matches(value,
                         '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}$')
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_date
      FROM recs WHERE field IS NOT NULL GROUP BY 1, 2)
SELECT host, field, n_values, n_nonempty, n_int, n_date,
       CASE WHEN n_nonempty > 0
            THEN CAST(n_int AS DOUBLE) / CAST(n_nonempty AS DOUBLE)
            ELSE 0.0 END AS int_rate,
       CASE WHEN n_nonempty > 0
            THEN CAST(n_date AS DOUBLE) / CAST(n_nonempty AS DOUBLE)
            ELSE 0.0 END AS date_rate
FROM g
"""


SQL_HREFLANG_BITEXT_PAIRS = f"""
WITH p AS (SELECT url, lang, {_SQL_PAGE} AS page FROM {CORPUS}),
mem AS (SELECT url, lang,
               md5(array_to_string(list_sort(list_transform(
                   regexp_extract_all(page, '{_ALT_TAG_RE}', 0),
                   t -> regexp_extract(t, '{_HREF_ATTR}', 1))), '|'))
                 AS cluster_id,
               len(regexp_extract_all(page, '{_ALT_TAG_RE}', 0)) AS n
        FROM p),
m AS (SELECT url, lang, cluster_id FROM mem WHERE n > 0),
kept AS (SELECT * FROM m WHERE cluster_id NOT IN
         (SELECT cluster_id FROM m GROUP BY 1 HAVING count(*) > 32))
SELECT a.cluster_id,
       a.url AS url_a, a.lang AS lang_a,
       b.url AS url_b, b.lang AS lang_b
FROM kept a JOIN kept b ON a.cluster_id = b.cluster_id
WHERE a.url < b.url AND a.lang <> b.lang
"""


# robots.txt parsing (functions/structured.robots_parse): line split,
# directive regex, per-line agent-BLOCK attribution (RFC 9309 stacked
# User-agent groups: the block for a rule = UA positions up to the
# last UA before it with no rule line in between — row-local list
# expressions, no state machine; one row per (rule, stacked agent)).
# Shared CTE block for the three robots queries.
_ROBOTS_LINE_RE = (r"(?i)^[ \t]*"
                   r"(user-agent|allow|disallow|sitemap|crawl-delay)"
                   r"[ \t]*:[ \t]*(.*?)[ \t\r]*$")
_ROBOTS_UA_RE = r"(?i)^[ \t]*user-agent[ \t]*:"
_ROBOTS_RULE_RE = r"(?i)^[ \t]*(allow|disallow|crawl-delay)[ \t]*:"

_SQL_ROBOTS_PARSE_BASE = f"""
rb AS (SELECT url, CASE WHEN url LIKE '%/robots.txt'
                        THEN decode(html) ELSE '' END AS t
       FROM {CORPUS}),
rs AS (SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS host,
              string_split(t, chr(10)) AS ls
       FROM rb),
rl AS (SELECT host, ls,
              list_filter(range(0, len(ls)),
                          i -> regexp_matches(ls[i + 1],
                                              '{_ROBOTS_UA_RE}')) AS ua,
              list_filter(range(0, len(ls)),
                          i -> regexp_matches(ls[i + 1],
                                              '{_ROBOTS_RULE_RE}')) AS rps,
              unnest(range(0, len(ls))) AS ln
       FROM rs),
rp0 AS (SELECT host, CAST(ln AS INTEGER) AS line_no,
               lower(regexp_extract(ls[ln + 1],
                                    '{_ROBOTS_LINE_RE}', 1)) AS directive,
               regexp_extract(ls[ln + 1], '{_ROBOTS_LINE_RE}', 2) AS value,
               CASE WHEN len(list_filter(ua, p -> p < ln)) > 0
                    THEN list_transform(
                        list_filter(ua, p ->
                            p <= list_max(list_filter(ua, q -> q < ln))
                            AND len(list_filter(rps, r ->
                                r > p AND r < list_max(
                                    list_filter(ua, q -> q < ln)))) = 0),
                        p -> lower(regexp_extract(
                            ls[p + 1], '{_ROBOTS_LINE_RE}', 2)))
                    ELSE [''] END AS grp_agents
        FROM rl),
rp1 AS (SELECT host, line_no,
               CASE WHEN directive = 'sitemap' THEN ['']
                    ELSE grp_agents END AS agents,
               directive, value
        FROM rp0
        WHERE directive IN ('allow', 'disallow', 'sitemap',
                            'crawl-delay')),
rp AS (SELECT host, line_no, unnest(agents) AS agent, directive, value
       FROM rp1)"""


def _sql_robots_effective(agent: str) -> str:
    """effective-rules CTE tail (host, prefix, allow) for ``agent``."""
    return f"""
ru AS (SELECT host, agent, directive, value FROM rp
       WHERE directive IN ('allow', 'disallow')
         AND agent IN ('*', '{agent}')),
spec AS (SELECT host,
                max(CASE WHEN agent = '{agent}' THEN 1 ELSE 0 END)
                  AS has_spec
         FROM ru GROUP BY host),
eff AS (SELECT ru.host, ru.value AS prefix,
               ru.directive = 'allow' AS allow
        FROM ru JOIN spec ON ru.host = spec.host
        WHERE (spec.has_spec = 1) = (ru.agent = '{agent}'))"""


SQL_ROBOTS_PARSE_LINES = f"""
WITH {_SQL_ROBOTS_PARSE_BASE}
SELECT host, line_no, agent, directive, value FROM rp
"""


SQL_ROBOTS_EFFECTIVE_RULES = f"""
WITH {_SQL_ROBOTS_PARSE_BASE},
{_sql_robots_effective('fetchbot')}
SELECT host, prefix, allow FROM eff
"""


def _sql_robots_match(path: str, prefix: str) -> str:
    """RFC 9309 rule-match residual (links.robots_rule_pattern twin):
    plain rules keep starts_with; rules carrying ``*`` or a trailing
    ``$`` translate to an anchored RE2 pattern (escape literals,
    ``*`` -> ``.*``, trailing ``$`` -> end anchor)."""
    body = (f"CASE WHEN {prefix} LIKE '%$' "
            f"THEN substr({prefix}, 1, length({prefix}) - 1) "
            f"ELSE {prefix} END")
    pat = (f"'^' || replace(regexp_replace({body}, "
            "'([\\\\.\\[\\]{}()+?^|$])', '\\\\\\1', 'g'), '*', '.*') "
           f"|| CASE WHEN {prefix} LIKE '%$' THEN '$' ELSE '' END")
    return (f"CASE WHEN {prefix} LIKE '%*%' OR {prefix} LIKE '%$' "
            f"THEN regexp_matches({path}, {pat}) "
            f"ELSE starts_with({path}, {prefix}) END")


SQL_ROBOTS_CORPUS_VERDICTS = f"""
WITH {_SQL_ROBOTS_PARSE_BASE},
{_sql_robots_effective('fetchbot')},
u AS (SELECT url,
        regexp_extract(url, 'https?://([^/]+)', 1) AS h,
        regexp_extract(url, 'https?://[^/]+(/.*)', 1) AS p
      FROM {CORPUS}),
mm AS (SELECT u.url,
        lpad(CAST(length(r.prefix) * 2 + CAST(r.allow AS INT)
                  AS VARCHAR), 6, '0') || '|' || r.prefix AS k
      FROM u LEFT JOIN eff r
        ON u.h = r.host AND {_sql_robots_match('u.p', 'r.prefix')})
SELECT url,
  coalesce(CAST(substr(max(k), 1, 6) AS INT) % 2 = 1, TRUE) AS allow,
  CASE WHEN max(k) IS NULL THEN '' ELSE substr(max(k), 8) END
    AS matched_prefix
FROM mm GROUP BY url
"""


SQL_ROBOTS_CRAWL_DELAYS = f"""
WITH {_SQL_ROBOTS_PARSE_BASE},
grp AS (SELECT host, agent, directive, value FROM rp
        WHERE directive IN ('allow', 'disallow', 'crawl-delay')
          AND agent IN ('*', 'fetchbot')),
spec AS (SELECT host,
                max(CASE WHEN agent = 'fetchbot' THEN 1 ELSE 0 END)
                  AS has_spec
         FROM grp GROUP BY host),
sel AS (SELECT grp.* FROM grp JOIN spec ON grp.host = spec.host
        WHERE (spec.has_spec = 1) = (grp.agent = 'fetchbot')),
dec AS (SELECT host, min(TRY_CAST(value AS BIGINT)) AS d
        FROM sel WHERE directive = 'crawl-delay' GROUP BY host),
hs AS (SELECT DISTINCT host FROM rp)
SELECT hs.host,
       coalesce(dec.d, CAST(1 AS BIGINT)) AS crawl_delay,
       dec.d IS NOT NULL AS declared
FROM hs LEFT JOIN dec ON hs.host = dec.host
"""


#: any sitemap-file capture url (root /sitemap.xml or an index child
#: like /sitemap-0.xml) — structured.SITEMAP_URL_RE twin.
_SITEMAP_URL_RE = r"/sitemap[^/]*\.xml$"

_SQL_SITEMAP_ENTRIES_BASE = f"""
m AS (SELECT url, CASE WHEN regexp_matches(url, '{_SITEMAP_URL_RE}')
                       THEN decode(html) ELSE '' END AS xml
      FROM {CORPUS}),
se AS (SELECT {_HOST} AS host,
              unnest(regexp_extract_all(xml, '(?is)<url>(.*?)</url>', 1))
              AS en
       FROM m)"""


SQL_SITEMAP_ENTRIES = f"""
WITH {_SQL_SITEMAP_ENTRIES_BASE}
SELECT host,
       regexp_extract(en, '(?is)<loc>(.*?)</loc>', 1) AS loc,
       regexp_extract(en, '(?is)<lastmod>(.*?)</lastmod>', 1) AS lastmod
FROM se
"""


SQL_SITEMAP_INDEX_ENTRIES = f"""
WITH m AS (SELECT url,
                  CASE WHEN regexp_matches(url, '{_SITEMAP_URL_RE}')
                       THEN decode(html) ELSE '' END AS xml
           FROM {CORPUS}),
ie AS (SELECT {_HOST} AS host,
              unnest(regexp_extract_all(
                  xml, '(?is)<sitemap>(.*?)</sitemap>', 1)) AS en
       FROM m),
idx AS (SELECT host,
               regexp_extract(en, '(?is)<loc>(.*?)</loc>', 1) AS child_loc
        FROM ie),
maps AS (SELECT DISTINCT url AS child_loc FROM {CORPUS}
         WHERE regexp_matches(url, '{_SITEMAP_URL_RE}'))
SELECT idx.host, idx.child_loc,
       maps.child_loc IS NOT NULL AS captured
FROM idx LEFT JOIN maps ON idx.child_loc = maps.child_loc
"""


SQL_SITEMAP_COVERAGE = f"""
WITH {_SQL_SITEMAP_ENTRIES_BASE},
listed AS (SELECT host,
                  regexp_extract(en, '(?is)<loc>(.*?)</loc>', 1) AS u
           FROM se),
crawled AS (SELECT {_HOST} AS host, url AS u FROM {CORPUS}
            WHERE NOT regexp_matches(url, '{_SITEMAP_URL_RE}')),
j AS (SELECT coalesce(l.host, c.host) AS host, l.u AS lu, c.u AS cu
      FROM listed l FULL OUTER JOIN crawled c
        ON l.host = c.host AND l.u = c.u),
jj AS (SELECT j.* FROM j
       WHERE j.host IN (SELECT DISTINCT host FROM listed)),
a AS (SELECT host,
             CAST(sum(CASE WHEN lu IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_listed,
             CAST(sum(CASE WHEN cu IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_crawled,
             CAST(sum(CASE WHEN lu IS NOT NULL AND cu IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_both
      FROM jj GROUP BY host)
SELECT host, n_listed, n_crawled, n_both,
       CASE WHEN n_listed > 0
            THEN CAST(n_both AS DOUBLE) / CAST(n_listed AS DOUBLE)
            ELSE 0.0 END AS coverage_rate,
       CASE WHEN n_crawled > 0
            THEN CAST(n_crawled - n_both AS DOUBLE)
                 / CAST(n_crawled AS DOUBLE)
            ELSE 0.0 END AS orphan_rate
FROM a
"""


# RFC 9309 robots matching (functions/links.robots_verdicts): rules
# synthesized from the corpus's own (host, first-path-segment) census —
# md5-gated Disallow, a longer Allow carve-back, an equal-length
# Allow/Disallow tie slice. Winner = string max over the packed
# lpad(2*len+allow)|prefix key (longest-then-allow folded into one
# binary-comparable key), exactly the Spark side's fold.
SQL_ROBOTS_VERDICTS = f"""
WITH hs AS (SELECT DISTINCT
              regexp_extract(url, 'https?://([^/]+)', 1) AS host,
              regexp_extract(url, 'https?://[^/]+(/[^/]*)', 1) AS seg
            FROM {CORPUS}),
sig AS (SELECT host, seg, md5(host || '|' || seg) AS m FROM hs),
rules AS (
  SELECT DISTINCT host, '' AS prefix, TRUE AS allow FROM hs
  UNION ALL
  SELECT host, seg, FALSE FROM sig
  WHERE substr(m, 1, 1) BETWEEN '0' AND '7'
  UNION ALL
  SELECT host, seg || '/0000', TRUE FROM sig
  WHERE substr(m, 1, 1) BETWEEN '0' AND '7'
  UNION ALL
  SELECT host, seg, TRUE FROM sig
  WHERE substr(m, 1, 1) BETWEEN '0' AND '7'
    AND substr(m, 2, 1) IN ('a', 'b')),
u AS (SELECT url,
        regexp_extract(url, 'https?://([^/]+)', 1) AS h,
        regexp_extract(url, 'https?://[^/]+(/.*)', 1) AS p
      FROM {CORPUS}),
m AS (SELECT u.url,
        lpad(CAST(length(r.prefix) * 2 + CAST(r.allow AS INT)
                  AS VARCHAR), 6, '0') || '|' || r.prefix AS k
      FROM u LEFT JOIN rules r
        ON u.h = r.host AND {_sql_robots_match('u.p', 'r.prefix')})
SELECT url,
  coalesce(CAST(substr(max(k), 1, 6) AS INT) % 2 = 1, TRUE) AS allow,
  CASE WHEN max(k) IS NULL THEN '' ELSE substr(max(k), 8) END
    AS matched_prefix
FROM m GROUP BY url
"""


# robots-declared sitemaps vs actual captures
# (functions/structured.sitemap_discovery).
SQL_SITEMAP_DISCOVERY = f"""
WITH {_SQL_ROBOTS_PARSE_BASE},
declared AS (SELECT host, value AS declared_loc FROM rp
             WHERE directive = 'sitemap'),
maps AS (SELECT DISTINCT url AS declared_loc FROM {CORPUS}
         WHERE regexp_matches(url, '{_SITEMAP_URL_RE}'))
SELECT d.host, d.declared_loc,
       m.declared_loc IS NOT NULL AS captured
FROM declared d LEFT JOIN maps m ON d.declared_loc = m.declared_loc
"""


# lastmod-driven refetch list (functions/structured.stale_captures):
# sitemap <lastmod> strictly after the newest capture's calendar date.
SQL_STALE_CAPTURES = f"""
WITH {_SQL_SITEMAP_ENTRIES_BASE},
listed AS (SELECT host,
                  regexp_extract(en, '(?is)<loc>(.*?)</loc>', 1) AS url,
                  TRY_CAST(regexp_extract(
                      en, '(?is)<lastmod>(.*?)</lastmod>', 1)
                      AS DATE) AS lm
           FROM se),
newest AS (SELECT url, max(warc_ts) AS captured_at FROM {CORPUS}
           WHERE NOT regexp_matches(url, '{_SITEMAP_URL_RE}')
           GROUP BY url)
SELECT l.host, l.url, CAST(l.lm AS VARCHAR) AS lastmod, n.captured_at
FROM listed l JOIN newest n ON l.url = n.url
WHERE l.lm IS NOT NULL AND l.lm > CAST(n.captured_at AS DATE)
"""


# per-host compliance exposure (functions/structured.robots_blocked_rate)
# — the corpus-verdicts loop plus one host census, restricted to
# robots-publishing hosts.
SQL_ROBOTS_BLOCKED_RATE = f"""
WITH {_SQL_ROBOTS_PARSE_BASE},
{_sql_robots_effective('fetchbot')},
u AS (SELECT url,
        regexp_extract(url, 'https?://([^/]+)', 1) AS h,
        regexp_extract(url, 'https?://[^/]+(/.*)', 1) AS p
      FROM {CORPUS}),
mm AS (SELECT u.url, u.h,
        lpad(CAST(length(r.prefix) * 2 + CAST(r.allow AS INT)
                  AS VARCHAR), 6, '0') || '|' || r.prefix AS k
      FROM u LEFT JOIN eff r
        ON u.h = r.host AND {_sql_robots_match('u.p', 'r.prefix')}),
v AS (SELECT url, h,
             coalesce(CAST(substr(max(k), 1, 6) AS INT) % 2 = 1, TRUE)
               AS allow
      FROM mm GROUP BY url, h),
hs AS (SELECT DISTINCT host FROM rp)
SELECT v.h AS host,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN v.allow THEN 0 ELSE 1 END) AS BIGINT)
         AS n_blocked,
       CAST(sum(CASE WHEN v.allow THEN 0 ELSE 1 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS blocked_rate
FROM v JOIN hs ON v.h = hs.host
GROUP BY v.h
"""


SQL_CANONICAL_DUP_GROUPS = f"""
WITH p AS (SELECT url, {_SQL_PAGE} AS page FROM {CORPUS}),
d AS (SELECT url, {_SQL_CANONICAL} AS canonical_url FROM p)
SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT regexp_extract(url, '^[a-z]+://([^/?#]+)', 1))
            AS BIGINT) AS n_hosts,
       min(url) AS keep_url
FROM d WHERE canonical_url <> ''
GROUP BY 1 HAVING count(*) >= 2
"""


SQL_CRAWL_PRIORITIES = f"""
WITH pr AS ({SQL_HOST_PAGERANK}),
rates AS ({SQL_SNAPSHOT_DELTA})
SELECT regexp_replace(pr.host, '^[a-z]+://', '') AS host, pr.rank,
       coalesce(r.change_rate, CAST(0.0 AS DOUBLE)) AS change_rate,
       pr.rank * (CAST(1.0 AS DOUBLE)
                  + coalesce(r.change_rate, CAST(0.0 AS DOUBLE)))
         AS priority
FROM pr LEFT JOIN rates r
  ON regexp_replace(pr.host, '^[a-z]+://', '') = r.host
"""


#: frontier fetch list: sitemap phantom locs x host recrawl priority
#: (the crawl_priorities twin runs as a nested-CTE subquery, the same
#: composition the Spark side does by calling q_crawl_priorities).
SQL_FRONTIER_CANDIDATES = SQL_FRONTIER_CANDIDATES_TEMPLATE.format(
    entries_base=_SQL_SITEMAP_ENTRIES_BASE,
    corpus=CORPUS,
    priorities=SQL_CRAWL_PRIORITIES)


#: twin of urlnorm.url_pattern_census over the corpus urls: path ->
#: hex-run fold -> digit-run fold skeleton, per-host census with the
#: same trap threshold literal.
SQL_URL_PATTERN_CENSUS = f"""
WITH u AS (SELECT url,
    regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1) AS host,
    regexp_replace(regexp_replace(
      CASE WHEN regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)?', 1) = ''
           THEN '/'
           ELSE regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)?', 1) END,
      '[0-9a-f]{{8,}}', 'H', 'g'), '[0-9]+', 'N', 'g') AS skeleton
  FROM {CORPUS})
SELECT host, skeleton, CAST(count(*) AS BIGINT) AS n_urls,
       min(url) AS example_url,
       (count(*) >= 20) AS trap
FROM u GROUP BY 1, 2
"""


#: twin of queries.q_host_reciprocity — link-exchange (reciprocity)
#: census over the distinct simple host graph.
SQL_HOST_RECIPROCITY = f"""
WITH e0 AS (SELECT DISTINCT {_SQL_URL_PRE % 'url'} AS src,
                   {_sql_outlink(9)} AS dst
            FROM {CORPUS}
            UNION
            SELECT DISTINCT {_SQL_URL_PRE % 'url'}, {_sql_outlink(17)}
            FROM {CORPUS}),
e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
o AS (SELECT src, CAST(count(*) AS BIGINT) AS out_edges
      FROM e GROUP BY 1),
rc AS (SELECT a.src, CAST(count(*) AS BIGINT) AS reciprocal_edges
       FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
       GROUP BY 1)
SELECT o.src AS host, o.out_edges,
       coalesce(rc.reciprocal_edges, 0) AS reciprocal_edges,
       CAST(coalesce(rc.reciprocal_edges, 0) AS DOUBLE)
         / CAST(o.out_edges AS DOUBLE) AS reciprocity
FROM o LEFT JOIN rc ON o.src = rc.src
"""


def _sql_seed_dist_steps(hops: int) -> str:
    steps = []
    for k in range(1, hops + 1):
        steps.append(f"""d{k} AS (
  SELECT node, CAST(min(dist) AS INT) AS dist FROM (
    SELECT node, dist FROM d{k - 1}
    UNION ALL
    SELECT e.dst AS node, d{k - 1}.dist + 1 AS dist
    FROM e JOIN d{k - 1} ON e.src = d{k - 1}.node)
  GROUP BY 1)""")
    return ",\n".join(steps)


#: twin of queries.q_seed_distance — unrolled BFS relaxation, exact ints.
SQL_SEED_DISTANCE = f"""
WITH e0 AS (SELECT DISTINCT {_SQL_URL_PRE % 'url'} AS src,
                   {_sql_outlink(9)} AS dst
            FROM {CORPUS}
            UNION
            SELECT DISTINCT {_SQL_URL_PRE % 'url'}, {_sql_outlink(17)}
            FROM {CORPUS}),
e AS (SELECT DISTINCT src, dst FROM e0),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
d0 AS (SELECT node, CAST(0 AS INT) AS dist FROM nodes
       WHERE node IN ({", ".join(f"'{s}'" for s in TRUST_SEEDS)})),
{_sql_seed_dist_steps(3)}
SELECT n.node AS host, CAST(coalesce(d3.dist, -1) AS INT) AS dist
FROM nodes n LEFT JOIN d3 ON n.node = d3.node
"""


def _sql_hll_rank_links(st: str) -> str:
    """1 + leading-zero bits of the 60-bit hex tail (61 if empty) —
    same nibble CASE as the sketch-tier twin, local to avoid a
    circular import with queries.py."""
    first = f"substr({st}, 1, 1)"
    return f"""CASE WHEN {st} = '' THEN 61
    ELSE 4 * (15 - length({st}))
         + CASE WHEN {first} IN ('8','9','a','b','c','d','e','f') THEN 0
                WHEN {first} IN ('4','5','6','7') THEN 1
                WHEN {first} IN ('2','3') THEN 2
                ELSE 3 END
         + 1 END"""


_SQL_HLL_ALPHA = "0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0"


def _sql_hyperball_ctes(max_t: int) -> str:
    """Shared CTE chain for the HyperBall twins: distinct synthetic
    host edges -> per-node singleton HLL registers (r0) -> ``max_t``
    merge rounds (r1..r{max_t}) -> per-round raw estimates (est0..)."""
    parts = [f"""e0 AS (SELECT DISTINCT {_SQL_URL_PRE % 'url'} AS src,
                   {_sql_outlink(9)} AS dst
            FROM {CORPUS}
            UNION
            SELECT DISTINCT {_SQL_URL_PRE % 'url'}, {_sql_outlink(17)}
            FROM {CORPUS}),
e AS (SELECT DISTINCT src, dst FROM e0),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
hh AS (SELECT node, md5(node) AS h FROM nodes),
tt AS (SELECT node, CAST(concat('0x', substr(h, 1, 2)) AS BIGINT) AS j,
              ltrim(substr(h, 3, 15), '0') AS st
       FROM hh),
r0 AS (SELECT node, j, max({_sql_hll_rank_links('st')}) AS r
       FROM tt GROUP BY 1, 2)"""]
    for t in range(1, max_t + 1):
        parts.append(f"""r{t} AS (
  SELECT node, j, max(r) AS r FROM (
    SELECT node, j, r FROM r{t - 1}
    UNION ALL
    SELECT e.src AS node, r{t - 1}.j, r{t - 1}.r
    FROM e JOIN r{t - 1} ON r{t - 1}.node = e.dst)
  GROUP BY 1, 2)""")
    for t in range(0, max_t + 1):
        parts.append(f"""est{t} AS (
  SELECT node AS host, CAST({t} AS INT) AS t,
         CAST(count(*) AS BIGINT) AS n_registers,
         {_SQL_HLL_ALPHA}
           / (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                       list(pow(2.0, -r) ORDER BY j)),
                          (a, b) -> a + b)
              + CAST(256 - count(*) AS DOUBLE)) AS est_raw
  FROM r{t} GROUP BY node)""")
    return ",\n".join(parts)


#: twin of queries.q_host_hyperball — unrolled HyperBall rounds; the
#: register merge is max-per-(node, j) exactly as links.hyperball, and
#: the estimator fold lists pow(2, -r) in j order (exact powers of two,
#: deterministic sum order -> bit-exact doubles).
SQL_HOST_HYPERBALL = f"""
WITH {_sql_hyperball_ctes(3)}
SELECT * FROM est0
UNION ALL SELECT * FROM est1
UNION ALL SELECT * FROM est2
UNION ALL SELECT * FROM est3
"""

#: twin of queries.q_host_harmonic — telescoping shell readout of the
#: HyperBall table: H(v) = sum_t (N(t) - N(t-1)) / t, shells summed in
#: t order via the same list fold the Spark side runs.
SQL_HOST_HARMONIC = f"""
WITH {_sql_hyperball_ctes(3)},
balls AS (SELECT * FROM est0
          UNION ALL SELECT * FROM est1
          UNION ALL SELECT * FROM est2
          UNION ALL SELECT * FROM est3),
shells AS (SELECT c.host, c.t,
                  (c.est_raw - p.est_raw) / CAST(c.t AS DOUBLE) AS shell
           FROM balls c JOIN balls p
             ON c.host = p.host AND p.t = c.t - 1)
SELECT host, CAST(max(t) AS INT) AS max_t,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                list(shell ORDER BY t)),
                   (a, b) -> a + b) AS harmonic
FROM shells GROUP BY host
"""


def _sql_lpa_rounds(iters: int) -> str:
    """Chained per-round CTEs for the LPA twin: neighbor-label census,
    max-count, min-label-on-ties argmax, coalesce onto the previous
    labels — the exact two-phase aggregate the Spark side runs."""
    ctes = []
    for k in range(1, iters + 1):
        ctes.append(f"""nb{k} AS (
  SELECT e.src AS node, l.label FROM eu e
  JOIN l{k - 1} l ON e.dst = l.node),
cnt{k} AS (SELECT node, label, count(*) AS c FROM nb{k} GROUP BY 1, 2),
m{k} AS (SELECT node, max(c) AS mc FROM cnt{k} GROUP BY 1),
best{k} AS (SELECT c.node, min(c.label) AS blabel
            FROM cnt{k} c JOIN m{k} USING (node)
            WHERE c.c = m{k}.mc GROUP BY c.node),
l{k} AS (SELECT l.node, coalesce(b.blabel, l.label) AS label
         FROM l{k - 1} l LEFT JOIN best{k} b ON l.node = b.node)""")
    return ",\n".join(ctes)


#: twin of queries.q_host_communities — synchronous LPA, unrolled.
SQL_HOST_COMMUNITIES = f"""
WITH e0 AS (SELECT DISTINCT {_SQL_URL_PRE % 'url'} AS src,
                   {_sql_outlink(9)} AS dst
            FROM {CORPUS}
            UNION
            SELECT DISTINCT {_SQL_URL_PRE % 'url'}, {_sql_outlink(17)}
            FROM {CORPUS}),
eu AS (SELECT DISTINCT src, dst FROM (
         SELECT src, dst FROM e0
         UNION ALL SELECT dst, src FROM e0)
       WHERE src <> dst),
l0 AS (SELECT node, node AS label FROM (
         SELECT src AS node FROM eu UNION SELECT dst FROM eu)),
{_sql_lpa_rounds(3)}
SELECT node AS host, label AS community FROM l3
"""


#: twin of queries.q_community_modularity — LPA labels (l3) fed into
#: the per-community modularity censuses; every term two correctly-
#: rounded ops (L/m, then d*d) on exact integer censuses.
SQL_COMMUNITY_MODULARITY = f"""
WITH e0 AS (SELECT DISTINCT {_SQL_URL_PRE % 'url'} AS src,
                   {_sql_outlink(9)} AS dst
            FROM {CORPUS}
            UNION
            SELECT DISTINCT {_SQL_URL_PRE % 'url'}, {_sql_outlink(17)}
            FROM {CORPUS}),
eu AS (SELECT DISTINCT src, dst FROM (
         SELECT src, dst FROM e0
         UNION ALL SELECT dst, src FROM e0)
       WHERE src <> dst),
l0 AS (SELECT node, node AS label FROM (
         SELECT src AS node FROM eu UNION SELECT dst FROM eu)),
{_sql_lpa_rounds(1)},
lab AS (SELECT node, label AS community FROM l1),
ec AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       FROM e0 WHERE src <> dst),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ec),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
          SELECT a AS node FROM ec UNION ALL SELECT b FROM ec)
        GROUP BY 1),
dc AS (SELECT l.community, CAST(count(*) AS BIGINT) AS n_nodes,
              CAST(sum(d.degree) AS BIGINT) AS degree_sum
       FROM deg d JOIN lab l ON d.node = l.node GROUP BY 1),
lc AS (SELECT la.community, CAST(count(*) AS BIGINT) AS internal_edges
       FROM ec e JOIN lab la ON e.a = la.node
                 JOIN lab lb ON e.b = lb.node
       WHERE la.community = lb.community GROUP BY 1)
SELECT dc.community, dc.n_nodes,
       CAST(coalesce(lc.internal_edges, 0) AS BIGINT) AS internal_edges,
       dc.degree_sum,
       CAST(coalesce(lc.internal_edges, 0) AS DOUBLE) / CAST(mm.m AS DOUBLE)
         - (CAST(dc.degree_sum AS DOUBLE)
            / (2.0 * CAST(mm.m AS DOUBLE)))
           * (CAST(dc.degree_sum AS DOUBLE)
              / (2.0 * CAST(mm.m AS DOUBLE))) AS modularity_term
FROM dc LEFT JOIN lc USING (community) CROSS JOIN mm
"""
