"""Deterministic synthetic corpus generator (FIXTURES.md §1).

Builds the Common-Crawl-style ``documents`` table
``(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``
that the extraction pipeline reads. Everything is driven by
``random.Random(seed)`` — same seed, same bytes — because the corpus is the
byte-identity surface shared by the oracle and the Spark pipeline.

Row mix (FIXTURES.md §1): skewed Zipf-ish host distribution (exercises the
salted-key partitioning), ~15% embedded-PDF payloads (exercises the fallback
leg), ~2% junk/low-alpha payloads (usability gate), ~1% empty/corrupt
(poison rows), doctype-shaped main content (PAN / GST / UDYAM / unsupported)
with entity linkage groups so the validation joins R1-R12 get PASS, FAIL,
WARNING and SKIPPED cases, plus duplicate-PAN rows for the duplicate-id
groupBy check.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import os
import random
import string
import tempfile

from .oracle.pdf_stub import make_synthetic_pdf

DEFAULT_SEED = 42

#: bump whenever generation logic changes — cache filenames embed it so a
#: stale /tmp corpus from an older generator can never shadow the current
#: semantics (the corpus is the shared byte-identity surface).
CORPUS_VERSION = 10


def _read_source_bytes(path: str) -> bytes:
    """Read a module source file's bytes, ZIP-SAFELY: under the
    production ``--py-files`` deployment ``__file__`` points INSIDE
    the shipped zip (``.../pkg.zip/pkg/corpus.py``) where ``open()``
    raises NotADirectoryError — fall back to reading the member out of
    the archive so the fingerprint (and hence every cache filename) is
    identical across deployment modes."""
    try:
        with open(path, "rb") as fh:
            return fh.read()
    except OSError:
        import re
        import zipfile

        m = re.match(r"(.*?\.zip)[/\\](.*)", path)
        if not m:
            raise
        with zipfile.ZipFile(m.group(1)) as zf:
            return zf.read(m.group(2).replace(os.sep, "/"))


def source_fingerprint(*module_files: str) -> str:
    """md5 over the given source files' bytes, 8 hex chars.

    Cache filenames embed this IN ADDITION to the hand-bumped version:
    two edits to the generator under one version number (it happened —
    round 3 left a twin built mid-edit) can no longer leave a stale
    artifact whose name still matches. Hashing source bytes is the same
    trick the dedup-index cache uses for its input files."""
    h = hashlib.md5()
    for f in module_files:
        h.update(_read_source_bytes(f))
    return h.hexdigest()[:8]


#: fingerprint of THIS generator's source — any edit invalidates caches.
CORPUS_FINGERPRINT = source_fingerprint(os.path.abspath(__file__))


def corpus_cache_path(n_rows: int) -> str:
    """Single source of truth for the on-disk corpus cache filename
    (shared by ``queries.corpus_for``, ``oracle.twin`` and the scaling
    bench so the Spark side and the DuckDB side can never read two
    different corpora)."""
    return os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_corpus_v{CORPUS_VERSION}_{CORPUS_FINGERPRINT}"
        f"_{n_rows}.parquet")

_UPPER = string.ascii_uppercase
_NAME_WORDS = [
    "STELLAR", "NOVA", "APEX", "ORION", "ZENITH", "VERTEX", "PRIME", "DELTA",
    "ATLAS", "COSMIC", "EVEREST", "FALCON", "GRANITE", "HORIZON", "IVORY",
    "JUPITER", "KINETIC", "LUMINA", "MERIDIAN", "NEXUS", "OPAL", "PINNACLE",
    "QUANTUM", "RADIANT", "SUMMIT", "TITAN", "UNITY", "VALIANT", "WESTERN",
]
_PERSON_FIRST = ["RAMESH", "SURESH", "MAHESH", "DINESH", "RAKESH", "NARESH",
                 "KAMLESH", "HITESH", "JIGNESH", "BHAVESH"]
_PERSON_LAST = ["PATEL", "SHARMA", "MEHTA", "SHAH", "DESAI", "JOSHI", "TRIVEDI",
                "PANDYA", "VYAS", "BHATT"]
_STATES = [("24", "GUJARAT", "Gujarat"), ("27", "MAHARASHTRA", "Maharashtra"),
           ("29", "KARNATAKA", "Karnataka"), ("33", "TAMIL NADU", "Tamil Nadu"),
           ("07", "DELHI", "Delhi")]
_CITIES = ["AHMEDABAD", "MUMBAI", "PUNE", "SURAT", "VADODARA", "RAJKOT",
           "BENGALURU", "CHENNAI", "DELHI", "GANDHINAGAR"]
_CONSTITUTIONS = ["Private Limited Company", "Public Limited Company",
                  "Partnership", "Proprietorship", "Limited Liability Partnership"]
_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "es", "de", "fr", "zh"]
_BOILER_LINKS = ["Home", "About Us", "Products", "Contact", "Careers", "News",
                 "Privacy Policy", "Terms of Service", "Sitemap", "Login"]
_FILLER_WORDS = ("the quick brown fox jumps over lazy dog while autumn leaves "
                 "drift across quiet village roads and merchants trade spices "
                 "grain cloth near the old stone bridge every market morning").split()


def _zipf_hosts(rng: random.Random, n_hosts: int = 40) -> list:
    """Skewed host pool: host i has weight ~ 1/(i+1) (Zipf-ish)."""
    hosts = [f"host{i:02d}.example.com" for i in range(n_hosts)]
    weights = [1.0 / (i + 1) for i in range(n_hosts)]
    return hosts, weights


def _make_pan(rng: random.Random, holder: str) -> str:
    """PAN with the 4th char drawn from the holder-type map
    (`/root/reference/project/core/extractors/pan_card.py:12-24`)."""
    letters = "".join(rng.choice(_UPPER) for _ in range(5))
    letters = letters[:3] + holder + letters[4]
    return letters + f"{rng.randrange(10000):04d}" + rng.choice(_UPPER)


def _make_gstin(rng: random.Random, pan: str, state_code: str) -> str:
    """GSTIN whose chars 3-12 equal the PAN (checksum-consistency target)."""
    return state_code + pan + "1Z" + rng.choice(_UPPER + string.digits)


def _make_entity(rng: random.Random, eid: int) -> dict:
    state_code, state_upper, state_title = rng.choice(_STATES)
    holder = rng.choice(["C", "C", "C", "P", "F", "L", "T", "H"])
    pan = _make_pan(rng, holder)
    if holder == "P":
        name = f"{rng.choice(_PERSON_FIRST)} KUMAR {rng.choice(_PERSON_LAST)}"
    else:
        name = f"{rng.choice(_NAME_WORDS)} {rng.choice(_NAME_WORDS)} PRIVATE LIMITED"
    day, month, year = rng.randrange(1, 29), rng.randrange(1, 13), rng.randrange(1995, 2024)
    return {
        "eid": eid,
        "holder": holder,
        "pan": pan,
        "gstin": _make_gstin(rng, pan, state_code),
        "udyam": f"UDYAM-{state_upper[:2]}-{rng.randrange(100):02d}-{rng.randrange(10**7):07d}",
        "name": name,
        "state_upper": state_upper,
        "state_title": state_title,
        "city": rng.choice(_CITIES),
        "pin": f"{rng.randrange(360001, 396001)}",
        "inc_date": f"{day:02d}/{month:02d}/{year}",
        "constitution": rng.choice(_CONSTITUTIONS),
        "mobile": f"{rng.randrange(6, 10)}{rng.randrange(10**9):09d}",
        "email": f"contact{eid}@example.com",
    }


# ---------------------------------------------------------------------------
# Doctype body generators — each returns the main-content LINES.
# ---------------------------------------------------------------------------

def pan_body(rng: random.Random, e: dict, variant: int) -> list:
    lines = [
        "INCOME TAX DEPARTMENT GOVT. OF INDIA",
        "PERMANENT ACCOUNT NUMBER CARD",
    ]
    if e["holder"] == "P" and variant % 3 == 2:
        # name BEFORE the PAN token — exercises the reverse-scan fallback
        # (`pan_card.py:73-84`).
        lines += [e["name"], e["pan"]]
    else:
        lines += [e["pan"], e["name"]]
    lines += [
        "DATE OF INCORPORATION" if e["holder"] != "P" else "DATE OF BIRTH",
        e["inc_date"],
    ]
    if variant % 4 == 3:
        lines.append("SIGNATURE NOT VERIFIED")
    return lines


def gst_body(rng: random.Random, e: dict, variant: int, n_extra_places: int) -> list:
    lines = [
        "Form GST REG-06",
        "Registration Certificate",
        f"Registration Number : {e['gstin']}",
        "1.",
        "Legal Name",
        e["name"].title() if variant % 5 == 4 else e["name"],
        "2.",
        "Trade Name",
        f"{e['name'].split()[0]} TRADERS",
        "3.",
        "Constitution of Business",
        e["constitution"],
        "4.",
        "Address of Principal Place of",
        "Business",
        f"Building No./Flat No.: B-{rng.randrange(1, 99)}",
        f"Name of Premises/Building: {rng.choice(_NAME_WORDS).title()} Tower",
        f"Road/Street: {rng.choice(_NAME_WORDS).title()} Road",
        f"City/Town/Village: {e['city'].title()}",
        f"District: {e['city'].title()}",
        f"State: {e['state_title']}",
        f"PIN Code: {e['pin']}",
        "5.",
        "Date of Liability",
        "01/07/2017",
        f"Total Number of Additional Places of Business in the State: {n_extra_places}",
        "9.",
        f"{e['state_title']} Goods and Services Tax Act, 2017",
    ]
    if n_extra_places > 0:
        lines += ["Annexure A", "Details of Additional Places of Business"]
        for k in range(n_extra_places):
            lines += [
                f"{k + 1}",
                f"Plot No {rng.randrange(1, 500)}, {rng.choice(_NAME_WORDS).title()} Road,",
                f"{e['city'].title()}, {e['state_title']}, {e['pin']}",
            ]
    return lines


def udyam_body(rng: random.Random, e: dict, variant: int) -> list:
    ifsc = "".join(rng.choice(_UPPER) for _ in range(4)) + "0" + f"{rng.randrange(10**6):06d}"
    acct = f"{rng.randrange(10**11, 10**12)}"
    year0 = 2020 + variant % 3
    commence = e["inc_date"] if variant % 4 == 0 else f"01/0{1 + variant % 9}/{year0}"
    lines = [
        "UDYAM REGISTRATION CERTIFICATE",
        f"UDYAM REGISTRATION NUMBER {e['udyam']}",
        f"NAME OF ENTERPRISE : {e['name']}",
        f"PAN {e['pan']}",
        "ENTERPRISE TYPE CLASSIFICATION",
        f"1 {year0}-{(year0 + 1) % 100:02d} MICRO 15/07/{year0}",
        f"2 {year0 + 1}-{(year0 + 2) % 100:02d} SMALL 20/07/{year0 + 1}",
        "EMPLOYMENT DETAILS MALE FEMALE OTHER TOTAL "
        f"{rng.randrange(5, 50)} {rng.randrange(1, 30)} {rng.randrange(0, 3)} {rng.randrange(10, 80)}",
        "UNIT(S) DETAILS",
        f"1 M/S {e['name'].split(' PRIVATE')[0]} FLAT : {rng.randrange(1, 99)} "
        f"{rng.choice(_NAME_WORDS)} HOUSE {rng.choice(_CITIES)} {rng.choice(_NAME_WORDS)} "
        f"{rng.choice(_NAME_WORDS)} ROAD {e['pin']} {e['state_upper']} {e['city']}",
        "OFFICIAL ADDRESS OF ENTERPRISE",
        f"FLAT/DOOR/BLOCK NO. {rng.randrange(1, 99)}-A "
        f"NAME OF PREMISES/BUILDING {rng.choice(_NAME_WORDS)} HOUSE "
        f"VILLAGE/TOWN {e['city']} BLOCK {rng.choice(_NAME_WORDS)} "
        f"ROAD/STREET/LANE {rng.choice(_NAME_WORDS)} ROAD CITY {e['city']} "
        f"STATE {e['state_upper']} DISTRICT {e['city']} , PIN : {e['pin']}",
        f"MOBILE {e['mobile']} EMAIL : {e['email'].upper()}",
        f"DATE OF INCORPORATION {e['inc_date']}",
        f"DATE OF COMMENCEMENT {commence}",
        "BANK DETAILS BANK NAME IFS CODE BANK ACCOUNT NUMBER "
        f"{rng.choice(_NAME_WORDS)} BANK {ifsc} {acct}",
        "NATIONAL INDUSTRY CLASSIFICATION CODE(S)",
        "1 23 - MANUFACTURE OF OTHER NON-METALLIC PRODUCTS "
        "2393 - MANUFACTURE OF CERAMIC PRODUCTS "
        "23931 - MANUFACTURE OF CERAMIC ARTICLES MANUFACTURING",
    ]
    return lines


#: Press-quote lines for the encoding-damage tier (v10). Non-ASCII
#: alphabet restricted to ``text._MOJIBAKE_CHARS`` — every char's
#: mangled form is strict-cp1252-decodable AND in the repair table, so
#: the JVM table chain and the per-line codec kernel agree bit-exactly
#: on planted damage (the parity contract in test_encoding_repair.py).
_PRESS_QUOTES = (
    "Tribune review — praised the café’s “naïve charm… at €12 fare»",
    "Süddeutsche notiert: «größte Überraschung» — çünkü naïveté…",
    # no 'à' here: its mangled form is 'Ã' + NBSP and the extractor's
    # whitespace collapse eats the NBSP, leaving an unrepairable rest
    # (the press-quote contract test pins mangled forms NBSP-free)
    "Le Monde écrit : « très élégant » — vue de São Paulo…",
    "Official gazette: resolução nº 42 — año fiscal 2025 • «final»",
)


def mangle_mojibake(s: str) -> str:
    """The classic crawl bug, applied forward: the line's UTF-8 bytes
    read back as cp1252 (exactly what a mislabelled-charset origin
    serves). Chars whose forms strict cp1252 can't produce pass through
    untouched — _PRESS_QUOTES avoids them by contract."""
    out = []
    for ch in s:
        try:
            out.append(ch.encode("utf-8").decode("cp1252"))
        except UnicodeDecodeError:
            out.append(ch)
    return "".join(out)


def unsupported_body(rng: random.Random) -> list:
    """No-extractor doctype (Aadhaar/GPCB analogue). ~Half carry a
    press-quote line (v10); ~half of THOSE arrive mojibake-mangled —
    the planted positives for pipeline_encoding_damage (X149) and
    pipeline_mojibake_repair (X152)."""
    lines = [
        "CONSENT ORDER UNDER THE WATER ACT",
        " ".join(rng.choice(_FILLER_WORDS) for _ in range(18)),
        " ".join(rng.choice(_FILLER_WORDS) for _ in range(18)),
        f"Order number {rng.randrange(10**6)} issued for record keeping purposes",
    ]
    if rng.random() < 0.5:
        quote = _PRESS_QUOTES[rng.randrange(len(_PRESS_QUOTES))]
        if rng.random() < 0.5:
            quote = mangle_mojibake(quote)
        lines.insert(3, quote)
    return lines


# ---------------------------------------------------------------------------
# HTML wrapping — boilerplate chrome around a main-content block.
# ---------------------------------------------------------------------------

#: JSON-LD @type pool for the structured-data census (schema.org).
_JSONLD_TYPES = ("Article", "Invoice", "Organization", "Product")

#: hreflang alternate-language pool (the multilingual portal shape
#: hreflang clusters group by).
_ALT_LANGS = ("en", "hi", "de", "fr", "ta", "mr")

#: filing-history table statuses (row payload for the <table> extractor).
_FILING_STATUSES = ("ACCEPTED", "PENDING", "REJECTED", "SCRUTINY")


def filing_table(rng: random.Random) -> str:
    """A filing-history <table> block (one th header row + 2-5 td data
    rows) — the structured-markup shape the html_tables / table_records
    extractors parse. Lives OUTSIDE <article class="main-content"> so
    the main-content legs see it only through block scoring, like real
    registry portals' metadata tables."""
    trs = []
    for r in range(rng.randrange(2, 6)):
        d = _dt.date(2025, 1, 1) + _dt.timedelta(days=rng.randrange(300))
        trs.append(f"<tr><td>{r + 1}</td><td>{d.isoformat()}</td>"
                   f"<td>{rng.choice(_FILING_STATUSES)}</td>"
                   f"<td>{rng.randrange(100, 9900)}</td></tr>")
    return ('<div class="filing-history"><table>'
            "<tr><th>Sr</th><th>Filed</th><th>Status</th><th>Fee</th></tr>"
            + "".join(trs) + "</table></div>\n")


def remarks_table(rng: random.Random) -> str:
    """A 2-column review-remarks <table> (v9, ~5% of pages) whose
    'tags' value carries a LITERAL '|' — the cell shape
    ``table_markdown`` must escape to keep the rendered row's column
    count. Headers (Key/Value) are disjoint from the filing table's, so
    the typed ``filing_records`` pivot never sees these rows."""
    sev = rng.choice(("minor", "major", "critical"))
    tags = f"{rng.choice(_FILING_STATUSES)}|{sev}"
    return ('<div class="remarks"><table>'
            "<tr><th>Key</th><th>Value</th></tr>"
            f"<tr><td>tags</td><td>{tags}</td></tr>"
            f"<tr><td>run</td><td>{rng.randrange(1000)}</td></tr>"
            "</table></div>\n")


def hreflang_links(canonical: str) -> str:
    """Deterministic hreflang alternate set keyed on the canonical URL
    (NOT on the per-page rng): every page of one entity that carries
    hreflang lists the IDENTICAL alternate set, exactly how real
    multilingual portals annotate every variant with the full set —
    that identity is what hreflang_clusters groups by."""
    h = hashlib.md5(canonical.encode("utf-8")).hexdigest()
    n = 2 + int(h[0], 16) % 3  # 2-4 language variants
    start = int(h[1], 16) % len(_ALT_LANGS)
    langs = [_ALT_LANGS[(start + j) % len(_ALT_LANGS)] for j in range(n)]
    tags = [(f'<link rel="alternate" hreflang="{lg}" '
             f'href="{canonical}?hl={lg}">') for lg in langs]
    tags.append(f'<link rel="alternate" hreflang="x-default" '
                f'href="{canonical}">')
    return "".join(tags)


def wrap_html(rng: random.Random, title: str, body_lines: list,
              canonical: str | None = None) -> str:
    nav = " ".join(f'<a href="/{w.lower().replace(" ", "-")}">{w}</a>'
                   for w in rng.sample(_BOILER_LINKS, 6))
    related = " ".join(f'<a href="/doc/{rng.randrange(10**6)}">Document {i}</a>'
                       for i in range(1, 7))
    main = "<br>\n".join(body_lines)
    footer = " ".join(f'<a href="/{w.lower()}">{w}</a>' for w in rng.sample(_BOILER_LINKS, 4))
    # In-page directives (~real-crawl rates): robots meta on ~10%,
    # rel=canonical on ~30% (entity-keyed target, so near-copies of one
    # entity share it — the canonical-collapse dedup signal), one
    # JSON-LD block on ~25%. Draw order is part of the corpus contract
    # (CORPUS_VERSION bumps if it changes). Head-only additions: the
    # extraction legs drop head/script wholesale, so extracted text is
    # untouched.
    head_extra = ""
    if rng.random() < 0.85:
        # charset declaration on most pages (real-crawl shape); the
        # occasional legacy label is a DECLARATION only — payload bytes
        # are UTF-8 throughout (the transcode leg is the reader's job)
        cs = rng.choice(("utf-8", "utf-8", "utf-8", "UTF-8",
                         "iso-8859-1"))
        head_extra += f'<meta charset="{cs}">'
    if rng.random() < 0.10:
        robots = rng.choice(("noindex", "noindex,nofollow"))
        head_extra += f'<meta name="robots" content="{robots}">'
    if canonical is not None and rng.random() < 0.30:
        head_extra += f'<link rel="canonical" href="{canonical}">'
    if rng.random() < 0.25:
        t = rng.choice(_JSONLD_TYPES)
        head_extra += ('<script type="application/ld+json">'
                       f'{{"@context":"https://schema.org","@type":"{t}"}}'
                       '</script>')
    # hreflang alternates on ~15% of entity pages (v7): the SET is
    # md5-derived from the canonical, so same-entity pages share it.
    if canonical is not None and rng.random() < 0.15:
        head_extra += hreflang_links(canonical)
    # filing-history <table> on ~20% of pages (v7): structured markup
    # for the table extractor, outside the main-content article.
    table_block = filing_table(rng) if rng.random() < 0.20 else ""
    # review-remarks <table> on ~5% (v9): carries a literal '|' cell
    # for the markdown-escape contract.
    if rng.random() < 0.05:
        table_block += remarks_table(rng)
    return (
        "<html><head><title>" + title + "</title>" + head_extra
        + "<script>var t=1;</script><style>body{margin:0}</style></head>\n"
        "<body>\n"
        f"<nav>{nav}</nav>\n"
        f'<header><div class="brand">Portal</div></header>\n'
        f'<div class="sidebar">{related}</div>\n'
        "<div class=\"short\">Ad</div>\n"
        f'<article class="main-content">\n{main}\n</article>\n'
        + table_block +
        f"<footer>{footer} &copy; 2025</footer>\n"
        "</body></html>"
    )


def junk_payload(rng: random.Random) -> bytes:
    """Low-alpha payload that fails the usability gate (F1)."""
    digits = " ".join(str(rng.randrange(10**6)) for _ in range(30))
    return f"<html><body><div class='main'>{digits}</div></body></html>".encode()


#: soft-404 / parked-page shapes: (title, main-content lines). Real
#: crawls serve these with HTTP 200, so a corpus can only catch them by
#: content — the error-page census tier's planted positives (~2% of
#: rows, the real-crawl ballpark for soft 404s + parked domains).
_ERROR_SHAPES = (
    ("404 Not Found",
     ["The page you requested could not be found.",
      "Error 404. It may have been moved or deleted."]),
    ("Page not found",
     ["Sorry, this page does not exist anymore.",
      "Try searching from the homepage instead."]),
    ("Domain for sale",
     ["This domain is for sale. Buy this domain today.",
      "Make an offer to the registrar to acquire it."]),
    ("Under construction",
     ["This site is under construction. Coming soon.",
      "Check back later for updates."]),
    ("Account suspended",
     ["This account has been suspended by the host.",
      "Contact the hosting provider for details."]),
)


def soft404_payload(rng: random.Random) -> tuple:
    """(payload, body_text): a full boilerplate-wrapped error/parked
    page; ~30% arrive with a UTF-8 BOM (the charset-census shape —
    HTML_SNIFF_RE and the extraction legs both tolerate it)."""
    title, lines = _ERROR_SHAPES[rng.randrange(len(_ERROR_SHAPES))]
    payload = wrap_html(rng, title, lines).encode("utf-8")
    if rng.random() < 0.30:
        payload = b"\xef\xbb\xbf" + payload
    return payload, "\n".join(lines)


# ---------------------------------------------------------------------------
# Corpus assembly
# ---------------------------------------------------------------------------

def generate_rows(n_rows: int, seed: int = DEFAULT_SEED,
                  payload_scale: int = 1) -> list:
    """Deterministic list of row dicts (url, warc_ts, html, text, lang).

    Invariant: ``len(generate_rows(n)) == n`` (sitemap captures replace
    the tail page rows rather than appending).

    ``payload_scale > 1`` pads every non-PDF body with filler paragraphs
    (~scale x the default ~1.5KB page) to exercise production-sized
    (~100KB) payloads — Arrow batch memory, JVM<->Python transfer cost."""
    rng = random.Random(seed)
    hosts, weights = _zipf_hosts(rng)
    base_ts = _dt.datetime(2025, 1, 1)

    # Entity pool: ~1 entity per 3 rows; ~5% duplicate-PAN pairs.
    n_entities = max(4, n_rows // 3)
    entities = [_make_entity(rng, i) for i in range(n_entities)]
    for i in range(0, n_entities // 20 or 1):
        # duplicate-id rows: same PAN, conflicting name (FIXTURES.md §1).
        a, b = rng.randrange(n_entities), rng.randrange(n_entities)
        if a != b:
            entities[b]["pan"] = entities[a]["pan"]

    rows = []
    saw_bom = False
    for i in range(n_rows):
        host = rng.choices(hosts, weights=weights, k=1)[0]
        e = entities[i % n_entities]
        variant = i
        roll = rng.random()
        lang = rng.choice(_LANGS)
        ts = base_ts + _dt.timedelta(seconds=rng.randrange(365 * 24 * 3600))

        if roll < 0.01:  # corrupt/empty poison rows
            payload = b"" if rng.random() < 0.5 else b"\x00\xff\xfe<not html"
            body_text = ""
            kind = "corrupt"
        elif roll < 0.03:  # junk/low-alpha
            payload = junk_payload(rng)
            body_text = ""
            kind = "junk"
        elif roll < 0.05:  # soft-404 / parked pages (served as HTTP 200)
            payload, body_text = soft404_payload(rng)
            # charset-census guarantee: the FIRST soft-404 capture is
            # always BOM'd (the remaining ~30% stay rng-planted), so any
            # corpus with >= 1 soft-404 row carries the bom-utf8 class.
            if not saw_bom and not payload.startswith(b"\xef\xbb\xbf"):
                payload = b"\xef\xbb\xbf" + payload
            saw_bom = True
            kind = "soft404"
        elif roll < 0.06:  # meta-refresh redirect stubs (client-side
            # redirects a crawler stores as their own capture; the
            # target is a same-host page so redirect graphs resolve)
            target = (f"https://{host}/pan/"
                      f"{rng.randrange(max(1, i)):08d}")
            payload = (
                '<html><head><meta http-equiv="refresh" '
                f'content="{rng.choice([0, 0, 3])};url={target}">'
                "</head><body>Redirecting you to the new page."
                "</body></html>").encode("utf-8")
            body_text = ""
            kind = "redirect"
        else:
            r2 = rng.random()
            if r2 < 0.28:
                body, kind = pan_body(rng, e, variant), "pan"
            elif r2 < 0.56:
                n_extra = rng.choice([0, 0, 1, 2, 3])
                # Entity-linkage conflicts: ~15% of GST docs carry a
                # mismatching name, ~10% a conflicting PIN (rule FAIL cases).
                e_gst = dict(e)
                cr = rng.random()
                if cr < 0.15:
                    e_gst["name"] = f"{rng.choice(_NAME_WORDS)} MISMATCH PRIVATE LIMITED"
                elif cr < 0.25:
                    e_gst["pin"] = f"{rng.randrange(500001, 560001)}"
                body, kind = gst_body(rng, e_gst, variant, n_extra), "gst"
            elif r2 < 0.80:
                body, kind = udyam_body(rng, e, variant), "udyam"
            else:
                body, kind = unsupported_body(rng), "other"

            pdf_roll = rng.random()
            if pdf_roll < 0.04:
                # Scanned-style PDF: every page is a short fragment (< 50
                # chars, fails the per-page gate) so the OCR fallback leg
                # (S2/S3/F3) fires and re-recognizes all pages.
                joined = "\n".join(body)
                pages = [joined[i:i + 40] for i in range(0, len(joined), 40)]
                payload = make_synthetic_pdf(pages)
                body_text = ""
            elif pdf_roll < 0.15:  # embedded-PDF text leg
                junk_page = "| 123 456 789 000 111 |"  # fails per-page gate
                pages = [junk_page, "\n".join(body)]
                payload = make_synthetic_pdf(pages)
                body_text = " ".join(["\n".join(body)])
            else:
                if payload_scale > 1:
                    body = body + [
                        " ".join(rng.choice(_FILLER_WORDS) for _ in range(25))
                        for _ in range(14 * (payload_scale - 1))
                    ]
                canonical = (f"https://registry.example.org/entity/"
                             f"{e['pan']}")
                payload = wrap_html(rng, f"Document {i}", body,
                                    canonical=canonical).encode("utf-8")
                body_text = "\n".join(body)

        rows.append({
            "url": f"https://{host}/{kind}/{i:08d}",
            "warc_ts": ts,
            "html": payload,
            "text": body_text if rng.random() < 0.5 else "",
            "lang": lang,
        })

    # Sitemap captures (v7): one /sitemap.xml row per md5-gated host
    # (~half the hosts publish one, capped at n_rows//20), listing ~70%
    # of that host's crawled pages plus 2-5 phantom locs the crawler
    # never fetched — the listed-vs-crawled gap sitemap_coverage reports
    # on. The sitemap rows REPLACE the last len(sitemaps) page rows so
    # ``len(generate_rows(n)) == n`` stays an invariant (tests, the
    # --synthetic job flag and the streaming fixtures all slice by it);
    # a replaced page whose url a sitemap lists simply reads as
    # listed-not-yet-crawled, which is the real-crawl shape anyway.
    by_host: dict = {}
    for r in rows:
        h = r["url"].split("/")[2]
        by_host.setdefault(h, []).append(r["url"])
    site_rows = []
    budget = n_rows // 20

    def _urlset(entries: str) -> bytes:
        return ('<?xml version="1.0" encoding="UTF-8"?>'
                '<urlset xmlns='
                '"http://www.sitemaps.org/schemas/sitemap/0.9">'
                + entries + "</urlset>").encode("utf-8")

    def _site_row(url: str, payload: bytes) -> dict:
        return {"url": url,
                "warc_ts": base_ts + _dt.timedelta(
                    seconds=rng.randrange(365 * 24 * 3600)),
                "html": payload, "text": "", "lang": "en"}

    for host in hosts:  # fixed zipf order => deterministic append order
        if len(site_rows) >= budget:
            break
        urls = by_host.get(host)
        if not urls:
            continue
        hh = hashlib.md5(host.encode("utf-8")).hexdigest()
        if int(hh[:4], 16) % 2:
            continue
        listed = [u for u in urls if rng.random() < 0.7]
        phantoms = [f"https://{host}/archive/{rng.randrange(10**6):06d}"
                    for _ in range(rng.randrange(2, 6))]
        locs = listed + phantoms
        entries = [
            f"<url><loc>{u}</loc><lastmod>2025-{rng.randrange(1, 13):02d}-"
            f"{rng.randrange(1, 29):02d}</lastmod></url>"
            for u in locs]
        if int(hh[8], 16) % 3 == 0 and len(locs) >= 2:
            # sitemap INDEX host (v9): /sitemap.xml is a
            # sitemap-of-sitemaps listing two captured children that
            # split the urlset alternately — plus, on ~half of these
            # hosts, a third child the crawler never fetched (the
            # index-level gap sitemap_index_entries reports captured
            # = false for).
            kids = [f"https://{host}/sitemap-0.xml",
                    f"https://{host}/sitemap-1.xml"]
            idx_entries = "".join(
                f"<sitemap><loc>{k}</loc></sitemap>" for k in kids)
            if int(hh[9], 16) % 2:
                idx_entries += (f"<sitemap><loc>https://{host}"
                                "/sitemap-2.xml</loc></sitemap>")
            idx_payload = ('<?xml version="1.0" encoding="UTF-8"?>'
                           '<sitemapindex xmlns='
                           '"http://www.sitemaps.org/schemas/sitemap/0.9">'
                           + idx_entries + "</sitemapindex>"
                           ).encode("utf-8")
            site_rows.append(_site_row(f"https://{host}/sitemap.xml",
                                       idx_payload))
            site_rows.append(_site_row(kids[0], _urlset(
                "".join(entries[0::2]))))
            site_rows.append(_site_row(kids[1], _urlset(
                "".join(entries[1::2]))))
        else:
            site_rows.append(_site_row(f"https://{host}/sitemap.xml",
                                       _urlset("".join(entries))))
    # robots.txt captures (v8): one per md5(host)%3==0 host (a gate
    # DISJOINT in pattern from the sitemap's %2, so hosts carry
    # either/both/neither), written in the real wire shape: comments,
    # blank group separators, mixed-case directive names, a wildcard
    # group (1-2 Disallow prefixes over the host's own path kinds, an
    # md5-gated Allow carve-back), on ~half an additional fetchbot
    # group, a Crawl-delay the matcher ignores, and — when the host
    # also publishes a sitemap — the cross-linking `Sitemap:` line.
    robots_rows = []
    budget_r = n_rows // 30
    kinds = ("pan", "gst", "udyam", "other")
    for host in hosts:
        if len(robots_rows) >= budget_r:
            break
        if host not in by_host:
            continue
        hh = hashlib.md5(host.encode("utf-8")).hexdigest()
        if int(hh[:4], 16) % 3:
            continue
        lines = ["# robots.txt for " + host, "User-Agent: *"]
        n_dis = 1 + int(hh[4], 16) % 2
        for j in range(n_dis):
            kind = kinds[(int(hh[5 + j], 16) + j) % len(kinds)]
            lines.append(f"Disallow: /{kind}/")
            if int(hh[7 + j], 16) % 2:
                lines.append(f"Allow: /{kind}/0000")
        # RFC 9309 wildcard rules (v9) on ~half the robots hosts: an
        # end-anchored Disallow over the host's own 8-digit ids plus,
        # on a sub-gate, a LONGER end-anchored Allow carve-back — the
        # *-and-$ matching surface the wildcard matcher must honor.
        has_wild = int(hh[11], 16) % 2 == 0
        kind_w = kinds[int(hh[12], 16) % len(kinds)]
        if has_wild:
            d = int(hh[13], 16) % 10
            lines.append(f"Disallow: /{kind_w}/*{d}$")
            if int(hh[14], 16) % 2:
                d2 = int(hh[15], 16) % 10
                lines.append(f"Allow: /{kind_w}/*{d2}{d}$")
        lines.append(f"Crawl-delay: {1 + int(hh[9], 16) % 9}")
        if int(hh[10], 16) % 2:
            grp = ["", "User-agent: fetchbot", "Disallow: /"]
            # on wildcard hosts the fetchbot group carves one kind
            # back with a '*' Allow, so wildcard matching is exercised
            # in fetchbot-EFFECTIVE rules on high-traffic hosts too
            # (the *-group's $ rules are only selected where no
            # fetchbot group exists).
            if has_wild:
                grp.append(f"Allow: /{kind_w}/*")
            lines.extend(grp)
        # stacked multi-agent group (v9) on a disjoint sub-gate: one
        # group opened by TWO consecutive User-agent lines whose rules
        # bind to both agents (fetchbot included).
        if int(hh[16], 16) % 2:
            kind_s = kinds[int(hh[17], 16) % len(kinds)]
            lines.extend(["", "User-agent: newsbot",
                          "User-agent: fetchbot",
                          f"Disallow: /{kind_s}/stacked"])
        if int(hh[:4], 16) % 2 == 0:  # the sitemap gate (v7)
            lines.extend(["", f"Sitemap: https://{host}/sitemap.xml"])
        robots_rows.append({
            "url": f"https://{host}/robots.txt",
            "warc_ts": base_ts + _dt.timedelta(
                seconds=rng.randrange(365 * 24 * 3600)),
            "html": ("\n".join(lines) + "\n").encode("utf-8"),
            "text": "",
            "lang": "en",
        })
    extra = site_rows + robots_rows
    if extra:
        rows = rows[:n_rows - len(extra)] + extra
    return rows


def generate_corpus(n_rows: int, seed: int = DEFAULT_SEED,
                    payload_scale: int = 1):
    """Corpus as a pandas DataFrame (parquet-ready)."""
    import pandas as pd

    return pd.DataFrame(generate_rows(n_rows, seed, payload_scale))


def write_corpus(path: str, n_rows: int, seed: int = DEFAULT_SEED,
                 payload_scale: int = 1) -> str:
    """Write the corpus to parquet at ``path`` and return the path."""
    df = generate_corpus(n_rows, seed, payload_scale)
    # Spark rejects TIMESTAMP(NANOS); coerce to microseconds on write.
    df.to_parquet(path, index=False, coerce_timestamps="us",
                  allow_truncated_timestamps=True)
    return path
