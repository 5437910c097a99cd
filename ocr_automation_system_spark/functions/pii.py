"""Checksum-validated PII detection and redaction (X153).

Regex candidates alone over-redact: a 16-digit order id, a timestamp,
or a log line hits the card-number pattern and gets destroyed. Both
detectors here gate redaction on the instrument's own integrity
checksum — Luhn (ISO/IEC 7812) for payment-card numbers, mod-97
(ISO 13616) for IBANs — so random digit runs survive the scrub: a
uniform-random 16-digit run is Luhn-valid only 10% of the time and an
IBAN-shaped string passes mod-97 ~1% of the time. This is the standard
production refinement over ``curation.pii_scrub``'s pattern-only pass
(reference analogue: the checksum-style rule validations in
``/root/reference/project/verification_engine/``, re-expressed as a
corpus scrub stage).

Everything is row-local JVM expression work — candidate extraction is
one ``regexp_extract_all``, each validation a bounded higher-order fold
over at most 39 digit positions, redaction a fold of literal
``replace`` calls over the validated candidates. Zero shuffle, zero
Python, one codegen projection per document at any corpus size (HOF
lambdas evaluate interpreted — narrow, not whole-stage — but stay on
the JVM). The mod-97 of a rearranged IBAN (up to 68 expanded digits,
past int128) is computed WITHOUT big integers: positional powers of 10
modulo 97 cycle with period 96, so a 96-entry literal table turns the
fold into ``sum(d_i * POW10[(L-1-i) mod 96]) mod 97`` — exact in plain
int64 (each term < 1000, at most 68 terms).

Cross-engine parity is by construction: the regexes are RE2-safe (no
lookaround, no backreferences), the letter->two-digit expansion is one
chained-replace table rendered into both engines from
``IBAN_LETTER_MAP``, and the power table is the same literal list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Payment-card candidate: a bare 13-19-digit run, or the two real
#: presentation groupings (4-4-4-4 and Amex 4-6-5) with space/dash at
#: the GROUP boundaries only. A per-digit-separator pattern
#: (``[0-9](?:[ -]?[0-9]){12,18}``) is a false-positive machine: any
#: two adjacent numeric tokens totalling 13-19 digits ("0012361
#: 209965308330" from an IFSC+account line) become one candidate, and
#: 10% of random runs pass Luhn. The three alternatives are mutually
#: exclusive at any start position (13+ straight digits vs a separator
#: at offset 4 vs a digit there), so Java's leftmost-FIRST and RE2's
#: leftmost-LONGEST alternation semantics provably agree. RE2-safe.
CARD_RE = (r"[0-9]{13,19}"
           r"|[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}"
           r"|[0-9]{4}[ -][0-9]{6}[ -][0-9]{5}")

#: IBAN candidate: country code + 2 check digits + 11-30 alphanumerics
#: (ISO 13616 BBAN length bounds). Uppercase-only by spec. RE2-safe.
IBAN_RE = r"[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}"

#: letter -> its ISO 13616 two-digit value ('A'->'10' .. 'Z'->'35'),
#: rendered as a chained literal replace in BOTH engines (single source).
IBAN_LETTER_MAP: tuple = tuple(
    (chr(c), str(c - ord("A") + 10)) for c in range(ord("A"), ord("Z") + 1))

#: 10^k mod 97 for k = 0..95 (the full multiplicative cycle: period 96).
POW10_MOD97: list = [pow(10, k, 97) for k in range(96)]


# ---------------------------------------------------------------------------
# Column-expression validators (Spark side)
# ---------------------------------------------------------------------------

def luhn_valid(cand: Column) -> Column:
    """Luhn checksum over a candidate that may carry space/dash
    separators. Fold shape: strip separators -> reverse -> per-position
    double-every-second-digit-casting-out-nines -> sum % 10 == 0."""
    rev = F.reverse(F.regexp_replace(cand, "[ -]", ""))
    # transform binds rev's char array once; i is 0-based, so even i
    # (rightmost check digit first) counts plain, odd i doubles.
    terms = F.transform(
        F.split(rev, ""),
        lambda ch, i: F.when(
            i % 2 == 0, F.ascii(ch) - 48
        ).otherwise(
            F.when(F.ascii(ch) - 48 > 4, (F.ascii(ch) - 48) * 2 - 9)
            .otherwise((F.ascii(ch) - 48) * 2)),
    )
    return F.aggregate(terms, F.lit(0), lambda a, x: a + x) % 10 == 0


def _expand_letters(col: Column) -> Column:
    """ISO 13616 letter expansion as a chained literal replace (the
    MOJIBAKE_MAP idiom): 'GB82WEST...' -> '161182...'. Keys are single
    distinct uppercase letters and every value is pure digits, so the
    chain is order-free."""
    out = col
    for letter, val in IBAN_LETTER_MAP:
        out = F.replace(out, F.lit(letter), F.lit(val))
    return out


def iban_valid(cand: Column) -> Column:
    """ISO 13616 mod-97 check: move the first 4 chars to the end,
    expand letters to two-digit values, interpret as a decimal integer
    modulo 97 == 1 — computed positionally with the 96-cycle power
    table, never as a big integer."""
    digits = _expand_letters(
        F.concat(F.substr(cand, F.lit(5), F.lit(34)),
                 F.substr(cand, F.lit(1), F.lit(4))))
    n = F.length(digits)
    terms = F.transform(
        F.split(digits, ""),
        lambda ch, i: (F.ascii(ch) - 48)
        * F.element_at(F.lit(POW10_MOD97), (n - 1 - i) % 96 + 1),
    )
    return F.aggregate(terms, F.lit(0), lambda a, x: a + x) % 97 == 1


def _scrub_fold(text: Column, cands: Column, token: str) -> Column:
    """Replace every VALIDATED candidate occurrence with ``token`` —
    a fold of literal replaces over the (tiny) per-row candidate list;
    text rows with no candidates pass through unchanged."""
    return F.aggregate(
        cands, text, lambda acc, c: F.replace(acc, c, F.lit(token)))


def checksum_scrub_expr(t: Column) -> Column:
    """The scrubbed-text column alone (IBANs first, then Luhn-valid
    cards) — for callers that redact in place without the count
    columns (the ``--scrub-pii`` curate stage)."""
    iban_ok = F.filter(
        F.regexp_extract_all(t, F.lit(IBAN_RE), F.lit(0)), iban_valid)
    t1 = _scrub_fold(t, iban_ok, "<IBAN>")
    card_ok = F.filter(
        F.regexp_extract_all(t1, F.lit(CARD_RE), F.lit(0)), luhn_valid)
    return _scrub_fold(t1, card_ok, "<CARD>")


def pii_checksum_scrub(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Checksum-gated PII redaction: IBANs first (an IBAN's digit tail
    is itself a card-pattern candidate, so it must leave the text before
    the card pass counts — the pii_scrub email-before-phone discipline),
    then Luhn-valid card numbers. Returns per-doc candidate counts,
    validated counts, and the scrubbed text.

    Candidates that FAIL their checksum are counted but left untouched:
    that is the point of the operator."""
    t = F.col(text_col)
    iban_cands = F.regexp_extract_all(t, F.lit(IBAN_RE), F.lit(0))
    iban_ok = F.filter(iban_cands, iban_valid)
    t1 = _scrub_fold(t, iban_ok, "<IBAN>")
    card_cands = F.regexp_extract_all(t1, F.lit(CARD_RE), F.lit(0))
    card_ok = F.filter(card_cands, luhn_valid)
    t2 = _scrub_fold(t1, card_ok, "<CARD>")
    return df.select(
        id_col,
        F.size(iban_cands).cast("int").alias("n_iban_candidates"),
        F.size(iban_ok).cast("int").alias("n_ibans_valid"),
        F.size(card_cands).cast("int").alias("n_card_candidates"),
        F.size(card_ok).cast("int").alias("n_cards_valid"),
        t2.alias("scrubbed"),
    )


# ---------------------------------------------------------------------------
# Pure-Python twins (fixtures / oracle reasoning)
# ---------------------------------------------------------------------------

def luhn_valid_py(cand: str) -> bool:
    digits = cand.replace(" ", "").replace("-", "")
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = ord(ch) - 48
        total += d if i % 2 == 0 else (d * 2 - 9 if d > 4 else d * 2)
    return total % 10 == 0


def iban_valid_py(cand: str) -> bool:
    s = cand[4:] + cand[:4]
    for letter, val in IBAN_LETTER_MAP:
        s = s.replace(letter, val)
    return int(s) % 97 == 1
