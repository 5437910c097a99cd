

def test_shard_range_plan_contiguous_balanced_deterministic(spark):
    """X183: histogram-derived range shards are value-contiguous,
    balance is off by at most one bucket's mass, and the plan is a pure
    function of the data (rerun-identical — no reservoir sampling)."""
    from pyspark.sql import functions as F

    from ocr_automation_system_spark.functions.sketch import (
        hist_buckets, shard_range_bounds, shard_range_plan,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val = F.length(F.coalesce(F.col("text"), F.lit("")))
    a = sorted((r["shard"], r["n_docs"], r["min_v"], r["max_v"])
               for r in shard_range_plan(docs, val, 8).collect())
    b = sorted((r["shard"], r["n_docs"], r["min_v"], r["max_v"])
               for r in shard_range_plan(docs, val, 8).collect())
    assert a == b                       # deterministic
    for (s1, _, _, hi), (s2, _, lo, _) in zip(a, a[1:]):
        assert s2 == s1 + 1 and hi < lo  # contiguous, non-overlapping
    total = sum(n for _, n, _, _ in a)
    hist = (hist_buckets(docs.select(val.alias("_v")), F.col("_v"))
            .groupBy("bucket_lo").agg(F.count(F.lit(1)).alias("n")))
    max_bucket = max(r["n"] for r in hist.collect())
    for _, n, _, _ in a:
        assert n <= total // 8 + max_bucket
    # bounds are reproducible from the artifact alone
    h = (hist_buckets(docs.select(val.alias("_v")), F.col("_v"))
         .groupBy("octave", "sub", "bucket_lo")
         .agg(F.count(F.lit(1)).alias("n")))
    assert shard_range_bounds(h, 8) == shard_range_bounds(h, 8)
    assert len(shard_range_bounds(h, 8)) == 7
