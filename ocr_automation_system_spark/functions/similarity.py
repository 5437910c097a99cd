"""Similarity search over an embedding column (``array<float>``).

Two tiers:

* **Brute-force cosine top-k** — the exactness baseline. One broadcast of
  the query vector; the scan stays narrow; top-k is a single
  ``orderBy().limit()`` (Spark's TakeOrdered — no full sort at scale).
* **LSH-bucketed ANN** — sign-bit bucketing on the leading dimensions
  (axis-aligned random-hyperplane LSH with deterministic planes, so the
  DuckDB oracle can replicate it): candidates are only same-bucket rows, so
  the search cost per query is the bucket size, not the corpus size. At
  10^12 rows the bucket table is the ANN index — write it once, hash-
  partitioned by bucket, and every query is a partition-pruned lookup.

All arithmetic is elementwise over ``double`` (cast from float32 first) with
left-to-right aggregation order, making results bit-identical between Spark
and DuckDB's ``list_*`` kernels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _d(col: Column) -> Column:
    """array<float> -> array<double> (fix the precision before any math)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(_d(a), _d(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(_d(a), lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    The query vector is a plan literal (broadcast by construction); the
    only wide operation is TakeOrdered(k). Ties break on id for
    determinism. Returns (vec_id, cos_sim rounded to 6)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(k)


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """LSH bucket id: sign bits of the first ``n_bits`` dimensions packed
    into an int. Axis-aligned hyperplanes — deterministic and oracle-
    replicable; swap for seeded random planes at production scale."""
    # try_element_at: a vector shorter than n_bits dims yields NULL (-> bit
    # 0) instead of a task-killing index error; matches the SQL oracle's
    # out-of-range list access returning NULL.
    bits = [
        F.when(F.try_element_at(_d(vec), F.lit(i + 1)) > 0,
               F.lit(2 ** (n_bits - 1 - i)).cast("long")).otherwise(F.lit(0).cast("long"))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucket_table(embeddings: DataFrame, n_bits: int = 8,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """The ANN index: (vec_id, bucket). Persist hash-partitioned by bucket."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )


def lsh_bucket_stats(embeddings: DataFrame, n_bits: int = 8,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Bucket occupancy — the skew diagnostic for the ANN index."""
    return (
        lsh_bucket_table(embeddings, n_bits, id_col, vec_col)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"),
             F.min("vec_id").alias("min_vec_id"))
    )


def lsh_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             n_bits: int = 8, probe_hamming: int = 0, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: score only LSH buckets within ``probe_hamming`` bits of
    the query's bucket.

    ``probe_hamming=0`` probes exactly one bucket (fastest, lowest recall);
    ``=1`` is classic multi-probe — the query bucket plus its n_bits
    single-bit-flip neighbors, trading (n_bits+1)x candidates for recall.
    The predicate stays a plain column filter (popcount of an XOR) —
    partition-prunable when the index table is partitioned by bucket."""
    q = [float(x) for x in query_vec]
    q_bucket = sum(2 ** (n_bits - 1 - i) for i in range(n_bits) if q[i] > 0)
    qcol = F.array(*[F.lit(x) for x in q])
    bucket = sign_bucket(F.col(vec_col), n_bits)
    if probe_hamming <= 0:
        pred = bucket == F.lit(q_bucket)
    else:
        pred = F.bit_count(bucket.bitwiseXOR(F.lit(q_bucket))) <= probe_hamming
    scored = (
        embeddings
        .filter(pred)
        .select(F.col(id_col).alias("vec_id"),
                F.round(cosine(F.col(vec_col), qcol), 6).alias("cos_sim"))
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(k)


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                          n_bits: int = 8, id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs: same-LSH-bucket candidates with cosine >=
    threshold. The self-join shuffles on the bucket key only; the quadratic
    blowup is confined to individual buckets (AQE skew-split if one bucket
    is pathological)."""
    t = embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("vec"),
                          sign_bucket(F.col(vec_col), n_bits).alias("bucket"))
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
