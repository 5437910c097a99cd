"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003) — the
guarantee, the density bound, the tie rule, and the pair detector's
cap law."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from ocr_automation_system_spark.functions.curation import (
    WINNOW_K, WINNOW_W, winnow_dup_pairs, winnow_fingerprints,
)

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("text", StringType(), True),
])


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def _df(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_winnow_guarantee_shared_run(spark):
    # Theorem 1 (Schleimer et al.): any shared verbatim run of
    # >= k + w - 1 tokens selects at least one common fingerprint in
    # both documents — for EVERY placement of the run. Exercise several
    # offsets so the shared window never aligns the same way twice.
    run = _words("shared", WINNOW_K + WINNOW_W - 1)     # exactly k+w-1
    for off in (0, 1, 5, 12):
        a = (_words("alpha", off) + " " + run + " "
             + _words("tailA", 9)).strip()
        b = (_words("beta", off + 3) + " " + run + " "
             + _words("tailB", 4)).strip()
        fps = winnow_fingerprints(_df(spark, [(1, a), (2, b)]))
        shared = (fps.groupBy("fp")
                  .agg(F.countDistinct("doc_id").alias("n"))
                  .filter(F.col("n") == 2).count())
        assert shared >= 1, f"guarantee violated at offset {off}"


def test_winnow_density_bound(spark):
    # Expected density is ~2/(w+1) of the gram stream; winnowing can
    # never select MORE than one fingerprint per window start, so the
    # artifact is bounded by the gram count and, on random-ish text,
    # sits near the theoretical density.
    n_tok = 400
    text = _words("tok", n_tok)
    fps = winnow_fingerprints(_df(spark, [(1, text)]))
    n_grams = n_tok - WINNOW_K + 1
    n_sel = fps.count()
    assert n_sel <= n_grams - WINNOW_W + 1
    # distinct tokens -> distinct hashes: density concentrates around
    # 2/(w+1); allow a wide band (randomness of md5)
    expected = 2.0 / (WINNOW_W + 1) * n_grams
    assert 0.5 * expected <= n_sel <= 2.0 * expected


def test_winnow_positions_and_short_docs(spark):
    rows = [
        (1, _words("a", WINNOW_K - 1)),       # no k-gram -> no fps
        (2, _words("b", WINNOW_K)),           # 1 gram, short-doc branch
        (3, ""),                              # empty
        (4, None),                            # null
        (5, _words("c", WINNOW_K + WINNOW_W)),
    ]
    fps = winnow_fingerprints(_df(spark, rows))
    by_id = {r["doc_id"]: r["n"] for r in
             fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    assert 1 not in by_id and 3 not in by_id and 4 not in by_id
    assert by_id[2] == 1                      # the one gram is selected
    assert by_id[5] >= 1
    # positions are 0-based gram offsets inside the doc
    pos = [r["pos"] for r in fps.filter(F.col("doc_id") == 5)
           .select("pos").collect()]
    n_grams = (WINNOW_K + WINNOW_W) - WINNOW_K + 1
    assert all(0 <= p < n_grams for p in pos)


def test_winnow_leftmost_lowest_tie_rule(spark):
    # A doc of one repeated token: every gram hashes identically, so
    # each window's min is its LEFTMOST position (the packed key's low
    # bits break the tie) -> exactly the window-start positions
    # 0..m-w are selected, all with the same 40-bit fp.
    text = " ".join(["rep"] * (WINNOW_K + WINNOW_W + 2))
    fps = winnow_fingerprints(_df(spark, [(1, text)]))
    rows = fps.collect()
    n_grams = (WINNOW_K + WINNOW_W + 2) - WINNOW_K + 1
    n_sel = n_grams - WINNOW_W + 1
    assert len(rows) == n_sel
    assert len({r["fp"] for r in rows}) == 1
    assert sorted(r["pos"] for r in rows) == list(range(n_sel))


def test_winnow_dup_pairs_detects_and_caps(spark):
    run = _words("copied", 20)
    boiler = _words("boiler", 12)
    rows = [
        (1, _words("one", 6) + " " + run),
        (2, run + " " + _words("two", 8)),
        (3, _words("three", 25)),
    ]
    # boilerplate run present in EVERY doc: with a tiny cap its
    # fingerprints must be dropped and contribute no pairs
    boiler_rows = [(i, t + " " + boiler) for i, t in rows]

    pairs = winnow_dup_pairs(_df(spark, rows), min_shared=2).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["n_shared_fps"] >= 2

    capped = winnow_dup_pairs(_df(spark, boiler_rows), min_shared=2,
                              max_docs_per_fp=2)
    assert ({(r["doc_a"], r["doc_b"]) for r in capped.collect()}
            == {(1, 2)})

    # red-if-removed: without the cap the boilerplate links everything
    uncapped = winnow_dup_pairs(_df(spark, boiler_rows), min_shared=2,
                                max_docs_per_fp=10_000)
    assert uncapped.count() == 3


def test_winnow_pair_join_never_explodes_on_repetition(spark):
    # the pair census joins on per-doc DISTINCT fps: a degenerate
    # repeated-token doc (many positions, one fp) contributes one row
    # per side, not positions^2
    rep = " ".join(["rep"] * 40)
    pairs = winnow_dup_pairs(
        _df(spark, [(1, rep), (2, rep)]), min_shared=1)
    rows = pairs.collect()
    assert len(rows) == 1
    assert rows[0]["n_shared_fps"] == 1


def test_winnow_shared_extents_localizes(spark):
    from ocr_automation_system_spark.functions.curation import (
        winnow_shared_extents,
    )

    run = _words("copied", 20)                      # 20-token shared run
    a = _words("alpha", 10) + " " + run + " " + _words("omega", 15)
    b = run + " " + _words("other", 30)
    rows = winnow_shared_extents(
        _df(spark, [(1, a), (2, b)]), min_shared=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    # run occupies tokens 10..29 in a, 0..19 in b; matched gram offsets
    # must sit inside those extents (gram start positions)
    assert 10 <= r["a_start"] <= r["a_end"] <= 29
    assert 0 <= r["b_start"] <= r["b_end"] <= 19
    # containment shape: extent covers most of the run on both sides
    assert r["a_end"] - r["a_start"] >= 5
    assert r["n_shared_fps"] >= 2


def test_winnow_rows_unique_and_zero_shuffle(spark):
    # (doc_id, fp, pos) rows are unique BY CONSTRUCTION (per-row
    # array_distinct + injective key unpack), which is why the
    # operator carries no global .distinct(): red-if-broken guard for
    # the uniqueness claim, plus a plan law pinning that the whole
    # projection stays shuffle-free (a distinct would add an Exchange).
    rows = [(i, _words("mix" if i % 2 else "rep", 30 + i))
            for i in range(1, 8)]
    rows.append((8, " ".join(["same"] * 25)))       # degenerate doc
    fps = winnow_fingerprints(_df(spark, rows))
    total = fps.count()
    assert total > 0
    assert fps.distinct().count() == total
    plan = fps._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_incremental_winnow_guarantee_and_cap(spark, tmp_path):
    """Index roundtrip: a new doc sharing a >= k+w-1 token run with an
    indexed doc MUST be caught (the winnowing theorem carried through
    the write/read/join path); novel docs keep; a boilerplate run
    shared by every corpus doc dies at WRITE time under the cap and
    links nothing."""
    from ocr_automation_system_spark.functions.curation import (
        incremental_winnow_dedup, write_winnow_index,
    )

    run = _words("copied", WINNOW_K + WINNOW_W - 1)
    boiler = _words("boiler", 12)
    corpus = _df(spark, [
        (0, _words("zero", 10) + " " + run + " " + boiler),
        (2, _words("two", 15) + " " + boiler),
        (4, _words("four", 20) + " " + boiler),
        (6, _words("six", 9) + " " + boiler)])
    idx = str(tmp_path / "widx")
    # cap=3: the boilerplate fps (present in all 4 corpus docs) must be
    # dropped at write time; the planted run's fps survive
    write_winnow_index(corpus, idx, max_docs_per_fp=3)

    new = _df(spark, [
        (1, _words("alpha", 5) + " " + run + " tail words here"),
        (3, _words("novel", 25)),
        (5, _words("boilonly", 6) + " " + boiler)])
    got = {r["doc_id"]: (r["n_corpus_dups"], r["dup_of"], r["keep"])
           for r in incremental_winnow_dedup(new, spark, idx,
                                             min_shared=1).collect()}
    assert got[1] == (1, 0, False)       # guaranteed catch, min corpus id
    assert got[3] == (0, -1, True)       # novel
    assert got[5] == (0, -1, True)       # boilerplate capped at write


def test_incremental_winnow_empty_index(spark, tmp_path):
    from ocr_automation_system_spark.functions.curation import (
        incremental_winnow_dedup,
    )

    new = _df(spark, [(1, _words("a", 12))])
    got = incremental_winnow_dedup(
        new, spark, str(tmp_path / "absent")).collect()
    assert [tuple(r) for r in got] == [(1, 0, -1, True)]


def test_winnow_aligned_spans_memorized_vs_scattered(spark):
    """X181: a verbatim 20-token reuse shows as ONE delta group with a
    tight extent in both docs; two short reuses at inconsistent offsets
    never form a >= 2-match delta group and are filtered out."""
    from ocr_automation_system_spark.functions.curation import (
        WINNOW_K, winnow_aligned_spans,
    )

    src_a = [f"a{i}" for i in range(40)]           # source A
    src_b = [f"b{i}" for i in range(40)]           # source B
    filler = [f"f{i}" for i in range(10)]
    run = src_a[5:25]                              # 20-token passage
    # gen 100: memorized run from A at gen offset 10 (delta = 5)
    gen_mem = filler + run + [f"g{i}" for i in range(8)]
    # gen 101: two 7-token runs from B at INCONSISTENT deltas
    gen_scatter = (src_b[0:7] + [f"h{i}" for i in range(9)]
                   + src_b[20:27])
    rows = [(1, " ".join(src_a)), (2, " ".join(src_b)),
            (100, " ".join(gen_mem)), (101, " ".join(gen_scatter))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = winnow_aligned_spans(df, F.col("doc_id") >= 100).collect()
    by_pair = {(r["gen_id"], r["doc_id"]): r for r in out}
    assert set(by_pair) == {(100, 1)}
    r = by_pair[(100, 1)]
    assert r["delta"] == 5 and r["n_matches"] >= 2
    # extents bound the reused passage (token-position granularity)
    assert 10 <= r["gen_start"] <= r["gen_end"] <= 10 + 20 - 1 + 0
    assert 5 <= r["src_start"] <= r["src_end"] <= 5 + 20 - 1
    assert r["gen_start"] - r["src_start"] == 5
    assert r["gen_end"] - r["src_end"] == 5
    # the end columns include the k-gram tail
    assert r["gen_end"] - r["gen_start"] >= WINNOW_K
