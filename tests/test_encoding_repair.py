"""X152 mojibake repair: table audit, fixture semantics, JVM <-> codec
kernel parity on the corpus, plan law, and the --fix-encoding curate hook."""

import pytest
from pyspark.sql import functions as F

from ocr_automation_system_spark.corpus import _PRESS_QUOTES, mangle_mojibake
from ocr_automation_system_spark.functions.curation import fix_encoding
from ocr_automation_system_spark.functions.text import (
    _MOJIBAKE_CHARS,
    MOJIBAKE_MAP,
    repair_mojibake,
    repair_mojibake_line,
    repair_mojibake_py,
    repair_mojibake_text_py,
)


# ---------------------------------------------------------------------------
# Table audit (the contract the SQL twin's replace-chain relies on)
# ---------------------------------------------------------------------------

def test_map_is_total_and_reversible():
    # every alphabet char has a strict-cp1252-decodable mangled form,
    # and repairing that form recovers the char exactly
    assert len(MOJIBAKE_MAP) == len(set(_MOJIBAKE_CHARS))
    for mangled, orig in MOJIBAKE_MAP:
        assert mangled == orig.encode("utf-8").decode("cp1252")
        assert mangled.encode("cp1252").decode("utf-8") == orig


def test_map_keys_sql_safe_and_non_overlapping():
    keys = [k for k, _ in MOJIBAKE_MAP]
    for a in keys:
        # renders into a single-quoted SQL literal verbatim
        assert "'" not in a and "\\" not in a
        for b in keys:
            # no key inside another: chained replace is order-free
            # (longest-first ordering is pure defense)
            assert a == b or a not in b
    # longest-first ordering actually holds
    lens = [len(k) for k in keys]
    assert lens == sorted(lens, reverse=True)


def test_map_excludes_cp1252_undefined_bytes():
    # '”' (0x9D undefined in cp1252) is the documented exclusion: the
    # table tier can't see it, the sloppy-codec kernel can
    assert all(orig != "”" for _, orig in MOJIBAKE_MAP)
    mangled_quote = "â€\x9d"  # what sloppy-cp1252 yields for '”'
    assert repair_mojibake_py(mangled_quote) == mangled_quote  # table: no-op
    assert repair_mojibake_line(mangled_quote) == "”"     # kernel: fixes


# ---------------------------------------------------------------------------
# Fixture semantics (both python paths; the Spark column is the same chain)
# ---------------------------------------------------------------------------

FIXTURES = [
    ("cafÃ©", "café"),                          # Latin-1 letter class
    ("heâ€™s â€œfineâ€“ishâ€¦", "he’s “fine–ish…"),  # cp1252 punct class
    ("Ã‚Â°C", "Â°C"),       # double mojibake: ONE round undone per pass
    ("plain ascii", "plain ascii"),
    ("", ""),
    ("café already clean", "café already clean"),
    ("� stays", "� stays"),           # U+FFFD is not repairable
]


@pytest.mark.parametrize("raw,fixed", FIXTURES)
def test_python_twin_fixtures(raw, fixed):
    assert repair_mojibake_py(raw) == fixed


def test_spark_column_matches_python_twin(spark):
    rows = [(i, raw) for i, (raw, _) in enumerate(FIXTURES)] + [(99, None)]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {r["id"]: r["r"]
           for r in df.select("id", repair_mojibake(F.col("t")).alias("r"))
           .collect()}
    for i, (raw, fixed) in enumerate(FIXTURES):
        assert got[i] == fixed, raw
    assert got[99] is None  # NULL in, NULL out


def test_line_kernel_refuses_mixed_lines():
    # a line with a LEGITIMATE non-ASCII char re-encodes to invalid
    # UTF-8 -> unchanged, even though it also carries a mangled form;
    # the table chain fixes the mangled part. Divergence class is
    # documented in fix_encoding's docstring.
    mixed = "real café beside mangled cafÃ©"
    assert repair_mojibake_line(mixed) == mixed
    assert repair_mojibake_py(mixed) == "real café beside mangled café"


def test_text_kernel_is_line_granular():
    txt = "clean ascii line\ncafÃ© fully mangled â€” line\nreal é line"
    assert (repair_mojibake_text_py(txt)
            == "clean ascii line\ncafé fully mangled — line\nreal é line")


# ---------------------------------------------------------------------------
# Corpus parity: JVM table chain == codec kernel on every extraction row
# (the planted alphabet is exactly the table's, so the two production
# modes must agree bit-for-bit; also proves the planting fired)
# ---------------------------------------------------------------------------

def test_modes_agree_on_corpus_and_planting_fired(spark, corpus_path):
    from ocr_automation_system_spark.operators.extract import (
        extract_documents,
    )

    res = (extract_documents(spark.read.parquet(corpus_path))
           .select("url", F.col("extracted_text").alias("text"))
           .persist())
    jvm = fix_encoding(res, mode="jvm")
    codec = fix_encoding(res, mode="codec")
    joined = (jvm.alias("a")
              .join(codec.alias("b"), "url")
              .select("url", F.col("a.text").alias("ta"),
                      F.col("b.text").alias("tb")))
    assert joined.filter(
        ~(F.col("ta").eqNullSafe(F.col("tb")))).count() == 0
    n_changed = (jvm.join(res.withColumnRenamed("text", "orig"), "url")
                 .filter(F.col("text") != F.col("orig")).count())
    assert n_changed > 0  # corpus v10 plants mangled press quotes
    res.unpersist()


def test_repair_clears_detector_on_corpus(spark, corpus_path):
    from ocr_automation_system_spark.functions.text import MOJIBAKE_RE
    from ocr_automation_system_spark.operators.extract import (
        extract_documents,
    )

    res = extract_documents(spark.read.parquet(corpus_path))
    t = F.coalesce(F.col("extracted_text"), F.lit(""))
    rep = repair_mojibake(t)
    row = res.agg(
        F.sum(F.regexp_count(t, F.lit(MOJIBAKE_RE))).alias("before"),
        F.sum(F.regexp_count(rep, F.lit(MOJIBAKE_RE))).alias("after"),
    ).collect()[0]
    assert row["before"] > 0 and row["after"] == 0


# ---------------------------------------------------------------------------
# Plan law: the JVM stage is a pure narrow projection
# ---------------------------------------------------------------------------

def test_jvm_mode_plan_is_narrow(spark):
    df = spark.range(10).select(
        F.col("id").cast("string").alias("url"),
        F.lit("cafÃ©").alias("text"))
    plan = (fix_encoding(df, mode="jvm")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Window" not in plan


def test_unknown_mode_raises(spark):
    df = spark.range(1).select(F.lit("u").alias("url"),
                               F.lit("t").alias("text"))
    with pytest.raises(ValueError):
        fix_encoding(df, mode="nope")


# ---------------------------------------------------------------------------
# Press-quote contract (corpus v10): planted alphabet subset of the table
# ---------------------------------------------------------------------------

def test_press_quotes_within_table_alphabet():
    for q in _PRESS_QUOTES:
        assert all(c.isascii() or c in _MOJIBAKE_CHARS for c in q)
        m = mangle_mojibake(q)
        assert m != q
        # mangled forms must survive the extractor's whitespace collapse
        # (NBSP = cp1252 0xA0, the mangled-'à' trap) or repair can't see
        # them post-extraction
        assert "\xa0" not in m
        assert repair_mojibake_py(m) == q
        assert repair_mojibake_text_py(m) == q


# ---------------------------------------------------------------------------
# Streaming parity: both modes are stateless (projection / mapInPandas),
# so the SAME bodies must run under readStream unchanged
# ---------------------------------------------------------------------------

def test_fix_encoding_streams_unchanged(spark, tmp_path):
    import os

    d = str(tmp_path / "in")
    os.makedirs(d)
    rows = [("u0", "plain ascii"),
            ("u1", "mangled cafÃ© and heâ€™s â€œquoteâ€¦"),
            ("u2", "legit café untouched"),
            ("u3", None)]
    spark.createDataFrame(rows, ["url", "text"]) \
        .write.parquet(os.path.join(d, "drop1"))
    stream_in = (spark.readStream.schema("url string, text string")
                 .parquet(os.path.join(d, "*")))
    for mode in ("jvm", "codec"):
        out = str(tmp_path / f"out_{mode}")
        q = (fix_encoding(stream_in, mode=mode)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", str(tmp_path / f"ck_{mode}"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
        want = sorted(tuple(r) for r in fix_encoding(
            spark.createDataFrame(rows, ["url", "text"]),
            mode=mode).collect())
        assert got == want and len(got) == 4, mode


# ---------------------------------------------------------------------------
# X179: closed alphabet + double-mojibake fixpoint
# ---------------------------------------------------------------------------

def test_alphabet_is_mangle_closed():
    """Every non-ASCII char in any mangled form is itself in the table
    (the property that makes depth-k unwinding exact) — except ” whose
    cp1252 byte 0x9D is undefined (documented codec-kernel-only)."""
    chars = {c for _, c in MOJIBAKE_MAP}
    for m, _ in MOJIBAKE_MAP:
        for ch in m:
            if ch.isascii():
                continue
            assert ch in chars or ch == "”", repr(ch)


def test_fix_seed_alias_free_and_in_alphabet():
    from ocr_automation_system_spark.queries import MOJIBAKE_FIX_SEED

    chars = {c for _, c in MOJIBAKE_MAP}
    for ch in MOJIBAKE_FIX_SEED:
        assert ch.isascii() or ch in chars, repr(ch)
    for m, _ in MOJIBAKE_MAP:
        assert m not in MOJIBAKE_FIX_SEED, repr(m)


def _true_mangle(s: str) -> str:
    out = []
    for ch in s:
        try:
            out.append(ch.encode("utf-8").decode("cp1252"))
        except UnicodeDecodeError:
            out.append(ch)
    return "".join(out)


def test_table_chain_unwinds_double_mangle_exactly():
    """repair^k == identity on true k-fold mangles of alias-free text
    over the closed alphabet, k = 1, 2, 3."""
    s = "café naïve — «München» €99 ™ reçu …fin ±3° º1ª"
    d = s
    for k in range(1, 4):
        d = _true_mangle(d)
        r = d
        for _ in range(k):
            r = repair_mojibake_py(r)
        assert r == s, f"depth {k}"
        # one extra application is the identity (safe over-estimate)
        assert repair_mojibake_py(r) == s


def _sloppy_mangle(s: str) -> str:
    """The REAL wire bug at byte level: every UTF-8 byte read back as
    cp1252, the five undefined bytes surviving as U+0081-style controls
    (what sloppy-windows-1252 decoders emit). Unlike the corpus's
    per-char strict mangle this also damages ``”`` — the class only the
    codec kernel can reverse."""
    out = []
    for byte in s.encode("utf-8"):
        try:
            out.append(bytes([byte]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(byte))
    return "".join(out)


def test_codec_kernel_fixpoint():
    from ocr_automation_system_spark.functions.text import (
        repair_mojibake_line_fix,
    )

    s = "voilà l'été — «fin» et ”done”"   # includes the 0x9D-byte char
    d2 = _sloppy_mangle(_sloppy_mangle(s))
    assert repair_mojibake_line_fix(d2) == s
    # single-pass kernel stops one layer deep on the same input
    assert repair_mojibake_line(d2) == _sloppy_mangle(s) != s
    # clean lines (even with legit accents) are untouched
    assert repair_mojibake_line_fix(s) == s
    assert repair_mojibake_line_fix("ascii only") == "ascii only"
    # strict-passthrough double-mangle orphans the 0x9D byte mid-line:
    # the kernel must REFUSE (identity), never corrupt
    dstrict = _true_mangle(_true_mangle(s))
    assert repair_mojibake_line_fix(dstrict) == dstrict


def test_mangle_expr_matches_python(spark):
    """The per-char JVM forward-mangle used for query planting equals
    corpus.mangle_mojibake byte-for-byte, including twice applied."""
    from pyspark.sql import functions as F

    from ocr_automation_system_spark.corpus import mangle_mojibake
    from ocr_automation_system_spark.functions.text import (
        mangle_mojibake_expr, repair_mojibake,
    )

    texts = ["café — «São» €9 ™", "plain ascii", "", "±½¾ ŸŽž ƒˆ˜"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["i", "t"])
    out = {r["i"]: (r["m1"], r["m2"], r["r2"]) for r in df.select(
        "i", mangle_mojibake_expr(F.col("t")).alias("m1"),
        mangle_mojibake_expr(mangle_mojibake_expr(F.col("t"))).alias("m2"),
        repair_mojibake(repair_mojibake(
            mangle_mojibake_expr(mangle_mojibake_expr(F.col("t")))))
        .alias("r2")).collect()}
    for i, t in enumerate(texts):
        assert out[i][0] == mangle_mojibake(t)
        assert out[i][1] == mangle_mojibake(mangle_mojibake(t))
        assert out[i][2] == t


def test_fix_encoding_depth_modes(spark):
    from ocr_automation_system_spark.functions.curation import fix_encoding

    s = "Größe: 25µm · ©2024 ®™"
    d2 = _true_mangle(_true_mangle(s))
    df = spark.createDataFrame([("u1", d2), ("u2", s), ("u3", None)],
                               ["url", "text"])
    for mode in ("jvm", "codec"):
        got = {r["url"]: r["text"]
               for r in fix_encoding(df, mode=mode, depth=2).collect()}
        assert got["u1"] == s, mode
        assert got["u2"] == s, mode
        assert got["u3"] is None, mode


# ---------------------------------------------------------------------------
# X184: Unicode NFC normalization stage
# ---------------------------------------------------------------------------

def test_nfc_stage_composes_and_collides(spark):
    """Decomposed and composed spellings of the same text normalize to
    identical bytes (the exact-dedup collision the stage exists for);
    ASCII and NULL rows pass through; string ids work (the job path)."""
    from ocr_automation_system_spark.functions.curation import nfc_stage

    comp = " Café déjà"
    decomp = " Café déjà"
    assert comp != decomp
    rows = [(1, "plain ascii"), (2, comp), (3, decomp), (4, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in nfc_stage(df).collect()}
    assert out[1]["text"] == "plain ascii" and not out[1]["changed"]
    assert out[2]["text"] == comp and not out[2]["changed"]
    assert out[3]["text"] == comp and out[3]["changed"]
    assert out[2]["text"] == out[3]["text"]        # dedup collision
    assert out[4]["text"] is None and not out[4]["changed"]
    # string-id schema follows the caller
    sdf = spark.createDataFrame([("u1", decomp)], ["doc_id", "text"])
    r = nfc_stage(sdf).collect()[0]
    assert r["doc_id"] == "u1" and r["text"] == comp


def test_nfkc_form_folds_compat_variants(spark):
    """X190: NFKC folds ligature/width/superscript variants NFC keeps;
    NFC output is unchanged on them; unknown form raises."""
    import pytest as _pytest

    from ocr_automation_system_spark.functions.curation import nfc_stage

    rows = [(1, "ﬁle Ａ ②"), (2, "plain"), (3, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    k = {r["doc_id"]: r for r in nfc_stage(df, form="NFKC").collect()}
    c = {r["doc_id"]: r for r in nfc_stage(df, form="NFC").collect()}
    assert k[1]["text"] == "file A 2" and k[1]["changed"]
    assert c[1]["text"] == "ﬁle Ａ ②" and not c[1]["changed"]
    assert k[2]["text"] == "plain" and k[3]["text"] is None
    with _pytest.raises(ValueError):
        nfc_stage(df, form="NFD")
