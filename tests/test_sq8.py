"""X171 SQ8 scalar quantization: code range/extremes, python-vs-JVM
encoder parity, degenerate dims, and the high-recall pin that separates
SQ8 from PQ on the same embeddings."""

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.clustering import (
    sq8_bounds,
    sq8_code_expr,
    sq8_encode_py,
    sq8_topk,
)

VECS = [
    (0, [0.0, -1.0, 5.0]),
    (1, [1.0, 1.0, 5.0]),
    (2, [0.5, 0.0, 5.0]),
    (3, [0.25, -0.5, 5.0]),
]


def _df(spark):
    return spark.createDataFrame(VECS, ["vec_id", "embedding"])


def test_bounds_and_code_extremes(spark):
    df = _df(spark)
    mins, maxs = sq8_bounds(df)
    assert mins == [0.0, -1.0, 5.0] and maxs == [1.0, 1.0, 5.0]
    rows = {r["vec_id"]: r["c"] for r in df.select(
        "vec_id", sq8_code_expr(F.col("embedding"), mins, maxs)
        .alias("c")).collect()}
    assert rows[0] == [0, 0, 0]       # mins -> 0; degenerate dim -> 0
    assert rows[1] == [255, 255, 0]   # maxs -> 255
    assert 126 <= rows[2][0] <= 128   # midpoint lands mid-range


def test_python_encoder_matches_jvm(spark):
    df = _df(spark)
    mins, maxs = sq8_bounds(df)
    jvm = {r["vec_id"]: r["c"] for r in df.select(
        "vec_id", sq8_code_expr(F.col("embedding"), mins, maxs)
        .alias("c")).collect()}
    for vid, vec in VECS:
        assert sq8_encode_py(vec, mins, maxs) == list(jvm[vid]), vid


def test_topk_self_is_nearest(spark):
    df = _df(spark)
    mins, maxs = sq8_bounds(df)
    top = sq8_topk(df, mins, maxs, VECS[2][1], k_results=2).collect()
    assert top[0]["vec_id"] == 2 and top[0]["sq_dist"] == 0


def test_recall_high_on_driver_embeddings(spark):
    from ocr_automation_system_spark.queries import q_embedding_sq8_recall

    r = q_embedding_sq8_recall(spark, "/root/testdata/sf0.001").collect()[0]
    # per-dim affine map preserves geometry: SQ8 measures 7/10 at
    # sf0.001 and 9/10 at sf0.01 where PQ's codebook distortion sits
    # ~3/10 on the same vectors; pin the separation, not the sample
    assert r["n_overlap"] >= 6


def test_asym_beats_symmetric_tie(spark):
    """X180: two corpus points whose 8-bit codes are equidistant from
    the query's 8-bit code (a symmetric TIE, broken arbitrarily by id)
    are separated correctly by the asymmetric 16-bit-query distance."""
    from ocr_automation_system_spark.functions.clustering import (
        sq8_asym_topk, sq8_encode_py, sq16_encode_py,
    )

    # bounds anchored by two extreme rows; q sits between a and b
    rows = [(0, [0.0, 0.0]), (1, [1.0, 1.0]),
            (10, [0.498, 0.5]), (11, [0.502, 0.5])]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")
    mins, maxs = [0.0, 0.0], [1.0, 1.0]
    q = [0.5004, 0.5]
    ca = sq8_encode_py(rows[2][1], mins, maxs)
    cb = sq8_encode_py(rows[3][1], mins, maxs)
    cq = sq8_encode_py(q, mins, maxs)
    # precondition: a genuine symmetric tie
    assert (ca[0] - cq[0]) ** 2 == (cb[0] - cq[0]) ** 2
    q16 = sq16_encode_py(q, mins, maxs)
    da = (257 * ca[0] - q16[0]) ** 2
    db = (257 * cb[0] - q16[0]) ** 2
    assert db < da          # asymmetric resolves toward the true nearer
    top = sq8_asym_topk(df, mins, maxs, q, k_results=4).collect()
    near = [r["vec_id"] for r in top if r["vec_id"] in (10, 11)]
    assert near[0] == 11    # 0.502 truly nearer to 0.5004 than 0.498


def test_arecall_not_below_symmetric(spark):
    from ocr_automation_system_spark.queries import (
        q_embedding_sq8_arecall, q_embedding_sq8_recall,
    )

    sym = q_embedding_sq8_recall(
        spark, "/root/testdata/sf0.001").collect()[0]["n_overlap"]
    asym = q_embedding_sq8_arecall(
        spark, "/root/testdata/sf0.001").collect()[0]["n_overlap"]
    assert asym >= sym >= 6
