"""Semantic tests for the training-pair mining tier: hard-negative
band selection (X106) and train/val split-leakage audit (X107)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_hard_negatives_match_numpy_bruteforce(spark):
    """The returned (q_id, rank, vec_id, cos_sim) table must equal a
    numpy brute-force replay: cosine vs every probe, round 6, drop
    self and >= 0.98 band, top-3 by (sim desc, vec_id)."""
    from ocr_automation_system_spark.queries import q_hard_negatives

    got = sorted(
        ((r["q_id"], r["rank"], r["vec_id"], r["cos_sim"])
         for r in q_hard_negatives(spark, SF).collect()))

    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    norms = np.sqrt((m * m).sum(axis=1))
    want = []
    for q in sorted(ids[ids < 5]):
        qv = m[ids == q][0]
        sims = np.round((m @ qv) / (norms * np.sqrt(qv @ qv)), 6)
        rows = [(int(v), float(s)) for v, s in zip(ids, sims)
                if v != q and s < 0.98]
        rows.sort(key=lambda t: (-t[1], t[0]))
        for rank, (v, s) in enumerate(rows[:3], 1):
            want.append((int(q), rank, v, s))
    assert got == sorted(want)
    # band law: nothing at/above the near-dup ceiling, no self pairs
    assert all(s < 0.98 for (_q, _r, _v, s) in got)
    assert all(q != v for (q, _r, v, _s) in got)


def test_split_leakage_pairs_cross_and_are_near_dups(spark):
    """Every audited pair crosses the split boundary, clears the 0.5
    Jaccard floor, and its split labels replay the md5-bucket split."""
    import hashlib

    from ocr_automation_system_spark.queries import (
        q_minhash_lsh_pairs, q_split_leakage,
    )

    def split_of(doc_id: int) -> str:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8],
                16) % 1000
        return "val" if b < 100 else "train"

    leaks = q_split_leakage(spark, SF).collect()
    assert leaks, "sf0.001 is known to contain cross-split near-dups"
    base = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in q_minhash_lsh_pairs(spark, SF).collect()}
    for r in leaks:
        assert r["jaccard"] >= 0.5
        assert r["split_a"] != r["split_b"]
        assert r["split_a"] == split_of(r["doc_a"])
        assert r["split_b"] == split_of(r["doc_b"])
        assert base[(r["doc_a"], r["doc_b"])] == r["jaccard"]
    # and it is exactly the crossing >= 0.5 subset of the pair ladder
    want = {(a, b) for (a, b), j in base.items()
            if j >= 0.5 and split_of(a) != split_of(b)}
    assert {(r["doc_a"], r["doc_b"]) for r in leaks} == want


def test_near_dup_agreement_census_consistent(spark):
    """The detector census must exactly reconcile with the two pair
    sets it audits: both + minhash_only = |M|, both + simhash_only =
    |S|, and the 'both' bucket equals the true pair intersection."""
    from pyspark.sql import functions as F

    from ocr_automation_system_spark.functions import dedup as D
    from ocr_automation_system_spark.queries import (
        load_table, q_near_dup_agreement,
    )

    docs = load_table(spark, SF, "documents")
    m = {(r["doc_a"], r["doc_b"]) for r in
         D.ngram_jaccard_pairs(docs, n=3, bands=4, rows_per_band=2)
         .filter(F.round("jaccard", 6) >= 0.6).collect()}
    s = {(r["doc_a"], r["doc_b"]) for r in
         D.simhash_near_pairs(docs, max_hamming=3).collect()}
    got = {r["detector"]: r["n_pairs"] for r in
           q_near_dup_agreement(spark, SF).collect()}
    assert got.get("both", 0) == len(m & s)
    assert got.get("minhash_only", 0) == len(m - s)
    assert got.get("simhash_only", 0) == len(s - m)
    # the audit is non-trivial on this corpus: detectors disagree
    assert got.get("both", 0) > 0
    assert got.get("simhash_only", 0) + got.get("minhash_only", 0) > 0
