"""Text-analysis operators for corpus curation (column-expression library).

Every function returns a ``pyspark.sql.Column`` built purely from built-in
JVM functions (whole-stage codegen, no Python), so the same semantics can be
stated in ANSI SQL for the DuckDB oracle (`__spark_entry__.oracle_sql`).

Reference lineage: the usability gate mirrors ``is_text_usable``
(`/root/reference/project/core/extractor.py:34-48`); the cleanup chain
mirrors ``_normalize_text`` (`core/extractors/gst_certi.py:705-711`) and
``_clean_field_value`` (`gst_certi.py:1309-1315`). The language-ID /
quality / token-count / fingerprint operators are the corpus-curation
extensions a 100 TB training-data pipeline needs (stopword-profile
language scoring, Gopher-style quality ratios, BPE-ish token counting,
content-defined fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Usability gate (F1) — `core/extractor.py:34-48`
# ---------------------------------------------------------------------------

MIN_TEXT_LENGTH = 50
MIN_ALPHA_RATIO = 0.4


def alpha_ratio(text: Column) -> Column:
    """letters / total chars, 0.0 for empty (``extractor.py:43-46``).

    ASCII letter class on purpose: the oracle contract needs identical
    semantics in Java regex (Spark) and RE2 (DuckDB); both agree on
    ``[A-Za-z]`` but disagree on ``\\p{L}`` corner cases.
    """
    letters = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    return F.when(F.length(text) > 0, letters / F.length(text)).otherwise(F.lit(0.0))


def is_text_usable(text: Column,
                   min_length: int = MIN_TEXT_LENGTH,
                   min_alpha: float = MIN_ALPHA_RATIO) -> Column:
    """F1: ``len(strip(text)) >= 50 AND alpha_ratio >= 0.4``."""
    stripped = F.trim(text)
    return (F.length(stripped) >= min_length) & (alpha_ratio(stripped) >= min_alpha)


# ---------------------------------------------------------------------------
# Cleanup chain (P33/P34)
# ---------------------------------------------------------------------------

def strip_control_chars(text: Column) -> Column:
    """P34 first step: remove C0 control chars except \\t \\n \\r."""
    return F.regexp_replace(text, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")


def collapse_whitespace(text: Column) -> Column:
    """Collapse runs of spaces/tabs, trim."""
    return F.trim(F.regexp_replace(text, "[ \\t]+", " "))


def clean_text(text: Column) -> Column:
    """P34-shaped canonicalization used before hashing/fingerprinting."""
    return collapse_whitespace(strip_control_chars(text))


# ---------------------------------------------------------------------------
# Tokenization + counting
# ---------------------------------------------------------------------------

#: BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
#: Same class syntax in Java regex and RE2.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased text ('' rows -> empty array)."""
    t = F.trim(F.lower(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, "\\s+")
    )


def ws_token_count(text: Column) -> Column:
    return F.size(ws_tokens(text)).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens — the cheap proxy for LLM token cost."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("long")


# ---------------------------------------------------------------------------
# Quality scoring (Gopher-style ratio features)
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "that", "for")


def stopword_ratio(text: Column) -> Column:
    toks = ws_tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    punct = F.length(F.regexp_replace(text, "[^.,;:!?]", ""))
    return F.when(F.length(text) > 0, punct / F.length(text)).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = ws_tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: each component contributes 0.25.

    * long enough (>= 200 chars)
    * alpha ratio >= 0.6
    * mean word length in the natural-language band [3, 10]
    * stopword ratio >= 0.05 (word-salad filter)
    """
    c1 = F.when(F.length(text) >= 200, 0.25).otherwise(0.0)
    c2 = F.when(alpha_ratio(text) >= 0.6, 0.25).otherwise(0.0)
    mwl = mean_word_length(text)
    c3 = F.when((mwl >= 3.0) & (mwl <= 10.0), 0.25).otherwise(0.0)
    c4 = F.when(stopword_ratio(text) >= 0.05, 0.25).otherwise(0.0)
    return c1 + c2 + c3 + c4


# ---------------------------------------------------------------------------
# Language ID (stopword-profile heuristic)
# ---------------------------------------------------------------------------

#: Tiny function-word profiles. At real scale this is a trigram model inside
#: a pandas UDF; the heuristic keeps the operator fully JVM-side + SQL-oracle
#: checkable. Order matters: ties resolve to the earlier profile.
LANG_PROFILES = (
    ("en", ("the", "and", "of", "to", "is", "a", "in", "that")),
    ("es", ("el", "la", "de", "que", "y", "los", "un", "una")),
    ("de", ("der", "die", "und", "das", "nicht", "ein", "ist", "zu")),
    ("fr", ("le", "la", "et", "les", "des", "une", "est", "que")),
)


def lang_scores(text: Column) -> dict[str, Column]:
    toks = ws_tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")
        for lang, words in LANG_PROFILES
    }


def lang_id(text: Column) -> Column:
    """argmax over profile scores; 'und' when every score is 0."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang, _ in reversed(LANG_PROFILES):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------

def content_hash(text: Column) -> Column:
    """Exact-dedup key: md5 of the cleaned text (hex string — identical in
    Spark and DuckDB, so it doubles as the oracle join key)."""
    return F.md5(clean_text(text))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the near-dup feature set)."""
    toks = ws_tokens(clean_text(text))
    k = F.size(toks) - (n - 1)
    grams = F.when(k > 0, F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


# MinHash family: h_i(s) = (A[i] * (base(s) mod P) + C[i]) mod P where
# base(s) = int(md5(s)[:15], 16). One md5 per shingle; each additional hash
# is two multiplies — the standard universal-hash permutation trick.
# A[i] * (h mod P) < 2^31 * 2^31 = 2^62: no int64 overflow.
MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)
MINHASH_A = (1103515245, 1299721, 104729, 7919, 65537, 22695477, 48271, 69621)
MINHASH_C = (12345, 999983, 101, 271828, 314159, 662607, 57721, 161803)


def shingle_hashes(shingle_col: Column) -> Column:
    """array<string> shingles -> array<long> base hashes (1 md5 each).
    15 hex digits < 2^60 fits a signed long; DuckDB twin:
    ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)``."""
    return F.transform(
        shingle_col,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )


def minhash_value(hash_arr: Column, i: int) -> Column:
    """Min-hash i over a pre-materialized base-hash array (see
    ``shingle_hashes``): ``min((A[i]*h + C[i]) mod P)``, sentinel
    MINHASH_P for an empty shingle set.

    The hash array must live in its own Project (materialized column) so
    each of the n min-hash expressions re-reads it instead of re-running
    tokenize->shingle->md5 — a plain fold-with-struct-state alternative
    benched ~8x slower (interpreted struct allocation per element)."""
    return F.coalesce(
        F.array_min(F.transform(
            hash_arr,
            lambda h: F.pmod(F.lit(MINHASH_A[i]) * F.pmod(h, F.lit(MINHASH_P))
                             + F.lit(MINHASH_C[i]), F.lit(MINHASH_P)),
        )),
        F.lit(MINHASH_P).cast("long"),
    )


def winnow_fingerprint(text: Column, n: int = 3) -> Column:
    """Document fingerprint: lexicographic-min md5 over the shingle set
    (a 1-band minhash — the winnowing 'rolling hash' analogue)."""
    return F.array_min(F.transform(shingles(text, n), F.md5))


#: hex digits whose nibble has bit 3 set (nibble & 8) — drives sim_hi
_HEX_HI = ("8", "9", "a", "b", "c", "d", "e", "f")
#: hex digits whose nibble has bit 2 set (nibble & 4) — drives sim_lo
_HEX_MID = ("4", "5", "6", "7", "c", "d", "e", "f")


def simhash_votes(text: Column) -> Column:
    """64 SimHash vote counters accumulated in ONE fold over the token
    digest array (single tokenization + one md5 per distinct token).

    Token hash = md5 hex (32 nibbles), widened to 64 bits by taking TWO
    bits per nibble (Manku et al. 64-bit layout): bit j (j<32) is the
    nibble-j top bit (digit >= '8'), bit 32+j is nibble-j bit 2. The
    counter is sum(+1/-1) — standard SimHash. Keep this struct in its own
    Project (see ``dedup.simhash_table``) so downstream field accesses
    don't re-inline the fold."""
    toks = F.array_distinct(ws_tokens(clean_text(text)))
    digests = F.transform(toks, F.md5)
    names = [f"v{j}" for j in range(64)]
    init = F.struct(*[F.lit(0).cast("long").alias(nm) for nm in names])

    def merge(acc, d):
        fields = []
        for j, nm in enumerate(names):
            cls = _HEX_HI if j < 32 else _HEX_MID
            fields.append(
                (acc[nm] + F.when(F.substring(d, j % 32 + 1, 1).isin(*cls),
                                  F.lit(1)).otherwise(F.lit(-1))).alias(nm))
        return F.struct(*fields)

    return F.aggregate(digests, init, merge)


def _pack_votes(votes: Column, offset: int) -> Column:
    out = F.lit(0).cast("long")
    for j in range(32):
        out = out + F.when(votes[f"v{offset + j}"] > 0,
                           F.lit(2 ** (31 - j)).cast("long")) \
                     .otherwise(F.lit(0).cast("long"))
    return out


def simhash_from_votes(votes: Column) -> Column:
    """Vote struct -> sim_hi (bits 0-31; identical to the legacy 32-bit
    SimHash). Kept for compatibility with existing tests/fixtures."""
    return _pack_votes(votes, 0)


def simhash_lo_from_votes(votes: Column) -> Column:
    """Vote struct -> sim_lo (bits 32-63 of the 64-bit signature).

    The 64-bit signature is the (sim_hi, sim_lo) pair, deliberately stored
    as two non-negative 32-bit values instead of one packed int64: bit 63
    of a packed long flips the sign, and signed shift/overflow semantics
    differ between engines (Spark ANSI longs vs DuckDB BIGINT) — two
    halves keep every value positive and every shift well-defined in both,
    with hamming = bit_count(hi^hi') + bit_count(lo^lo')."""
    return _pack_votes(votes, 32)


def simhash32(text: Column) -> Column:
    """Legacy 32-bit signature (== sim_hi of the 64-bit pair). For
    table-scale use ``dedup.simhash_table`` — its two-step projection
    evaluates the vote fold once per row instead of 32x."""
    return simhash_from_votes(simhash_votes(text))
