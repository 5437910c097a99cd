"""X163 Neyman allocation: sigma exactness vs statistics.pstdev,
zero-variance strata get zero, allocation tracks n*sigma, capping."""

import statistics

from ocr_automation_system_spark.functions.curation import neyman_allocation


def _docs(spark, spec):
    # spec: {stratum: [token counts]}; text 'a a a ...' = count tokens
    rows, i = [], 0
    for src, counts in spec.items():
        for c in counts:
            rows.append((i, " ".join(["a"] * c), src))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_sigma_matches_pstdev_and_constant_gets_zero(spark):
    spec = {"flat": [50] * 10, "wild": [10, 90, 10, 90, 10, 90, 10, 90,
                                        10, 90]}
    out = {r["stratum"]: r for r in
           neyman_allocation(_docs(spark, spec), 100).collect()}
    assert out["flat"]["sigma"] == 0.0
    assert abs(out["wild"]["sigma"]
               - statistics.pstdev(spec["wild"])) < 1e-12
    # all weight flows to the noisy stratum
    assert out["flat"]["alloc"] == 0
    assert out["wild"]["alloc"] == 10 and out["wild"]["capped"]


def test_allocation_proportional_to_n_sigma(spark):
    # equal n, sigma ratio 1:3 -> alloc ratio 1:3 (floor-rounded)
    spec = {"lo": [40, 60] * 20,            # pstdev 10
            "hi": [20, 80] * 20}            # pstdev 30
    out = {r["stratum"]: r for r in
           neyman_allocation(_docs(spark, spec), 40).collect()}
    assert not out["lo"]["capped"] and not out["hi"]["capped"]
    assert out["hi"]["alloc"] == 3 * out["lo"]["alloc"] == 30


def test_total_never_exceeds_target(spark):
    spec = {f"s{i}": [10 * (j % 7) for j in range(12)] for i in range(5)}
    out = neyman_allocation(_docs(spark, spec), 30).collect()
    assert sum(r["alloc"] for r in out) <= 30
