"""Distributed deterministic k-means + SemDedup-style semantic dedup.

The reference pipeline has no clustering tier; this supplies the two
pieces its 100-TB curation story needs on top of the ANN/IVF family
(``functions/similarity.py``):

* a **coarse quantizer trainer** — the k-means that produces the IVF
  centroids ``similarity.ivf_assign`` documents as "production swaps in
  k-means centroids computed offline";
* **SemDedup** (Abbas et al., 2023): drop semantic near-duplicates
  within each cluster, so the pairwise cosine work is confined to one
  cell instead of the whole corpus.

Determinism (the whole point — the DuckDB oracle must reproduce the
result bit-for-bit under any partitioning):

* embeddings are quantized to exact BIGINTs: ``floor(double(x) * 10^6)``
  — FLOAT→DOUBLE is exact, the scale+floor is one correctly-rounded IEEE
  op identical in the JVM, DuckDB, and CPython;
* every distance is exact int64 arithmetic (|q| <= ~2·10^6, so a
  64-dim squared distance tops out near 10^15 — no overflow);
* centroid update is the *quantized* mean ``floor(double(sum)/count)``
  — the int64 sum is partitioning-independent, the single division is
  the same IEEE op everywhere;
* argmin ties break on the lowest centroid id (first-min-wins), seeds
  are the first ``k`` rows by id — both order-free properties.

Scale shape (local[32] here, 1000 executors in spirit): assignment is a
narrow whole-stage-codegen projection (no Python); the per-iteration
centroid update is ONE map-side-combined groupBy producing exactly
``k·(dim+1)`` numbers on the driver; SemDedup's quadratic work is a
self-join bucketed by cell id with an occupancy cap, never all-pairs.
At 10^12 docs you raise ``k`` so cells stay ~10^5 and the int64 sums
stay exact (they hold to 2^63; the double mean is the same op on both
engines regardless).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_pair
from .text import bind_array

#: Fixed-point scale for embedding quantization (6 decimal digits).
QUANT_SCALE = 1_000_000

#: Default occupancy cap for the SemDedup within-cell self-join — a
#: B-row cell costs B^2 candidate pairs; cells larger than this are
#: skipped (and should trigger a larger k upstream).
SEMDEDUP_MAX_CELL = 100_000

#: Target mean cell size for ``semdedup_stage``'s auto-k: k scales as
#: ceil(n / target) so the cell-keyed self-join's parallelism grows
#: with the corpus instead of being pinned at a fixed k.
SEMDEDUP_TARGET_CELL = 2_048


def quantize(vec: Column, scale: int = QUANT_SCALE) -> Column:
    """array<float> -> array<bigint> fixed-point quantization."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * scale))


def _sq_dist(q: Column, c: Column) -> Column:
    """Exact int64 squared L2 distance between two bound vectors."""
    return F.aggregate(
        F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quant_bound(dim: int) -> int:
    """Largest |q| for which ``_sq_dist`` is int64-exact: the worst
    case is ``dim`` terms of ``(2B)^2``, so ``dim * 4B^2 < 2^63``.
    ``kmeans_fit`` asserts the data against this — silent non-ANSI
    int64 wraparound would corrupt assignments, not raise."""
    return math.isqrt((2 ** 63 - 1) // dim) // 2


def kmeans_assign(vec: Column, centroids: list,
                  pre_quantized: bool = False,
                  scale: int = QUANT_SCALE) -> Column:
    """Cell id = argmin over centroids of exact squared distance,
    first-min-wins on ties (== the SQL twin's ``ORDER BY dist, cid``).

    Pure JVM expression tree. The centroid set enters as ONE constant-
    folded array<array<long>> literal mapped by a single ``transform``
    lambda — generated code is O(1) in k (a per-centroid expression
    tree is k·dim literal NODES, recompiled by Janino every iteration
    because the literals change: measured seconds per fit at k=8,
    dim=64). ``bind_array`` evaluates the quantized vector and the
    distance array once each (the HOF codegen rules from
    ``functions/text.py``); ``array_position`` of the min picks the
    lowest-id winner. No Python in the hot path.
    """
    if not centroids:
        raise ValueError("kmeans_assign needs at least one centroid")
    q = vec if pre_quantized else quantize(vec, scale)
    # ONE py4j call for the whole centroid set: building k*dim nested
    # F.lit().cast() columns costs a JVM round-trip per literal
    # (measured ~1.8s per fit iteration at k=8, dim=64)
    cents = (F.lit([[int(v) for v in c] for c in centroids])
             .cast("array<array<long>>"))

    def _cell(qv: Column) -> Column:
        dists = F.transform(cents, lambda c: _sq_dist(qv, c))
        return bind_array(
            dists, lambda d: F.array_position(d, F.array_min(d))) - 1

    return bind_array(q, _cell).cast("long")


def kmeans_fit(df: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding", k: int = 8,
               iters: int = 3, scale: int = QUANT_SCALE) -> list:
    """Lloyd's k-means over quantized embeddings; returns the final
    centroids as ``k`` lists of ints (index == cell id), or ``[]`` on an
    empty/too-small table.

    Each iteration is one Spark job: a codegen assignment projection
    feeding ONE groupBy(cell) with ``dim`` int64 sums + a count — the
    partial combine means only ``k·(dim+1)`` longs ever reach the
    driver, independent of corpus size. Empty cells keep their previous
    centroid (== the twin's ``coalesce``). The quantized projection is
    persisted across iterations so the source scan (100 TB in
    production) runs once, not ``iters`` times.

    Seeds are the ``k`` smallest ids (== the twin's ``vec_id < k`` on
    the contiguous embeddings table; works for string ids too).

    ``scale``: fixed-point quantization factor. The default (10^6)
    suits unit-range float embeddings; for features that are ALREADY
    exact integers (e.g. ``text_feature_vec`` token counts) pass
    ``scale=1`` — scaling raw counts by 10^6 pushes ``(a-b)^2`` past
    int64 for a per-slot count difference >= ~3036 (ANSI mode turns
    that into a mid-job ARITHMETIC_OVERFLOW; non-ANSI it wraps
    silently and corrupts assignments). The fit asserts every
    quantized value against ``quant_bound(dim)`` BEFORE the first
    assignment — one map-side max over the persisted projection the
    first iteration reuses — so a violation raises with guidance
    instead of either failure mode.
    """
    init = (df.orderBy(id_col).limit(k).select(vec_col).collect())
    cents = [[math.floor(float(x) * scale) for x in r[0]]
             for r in init]
    if not cents:
        return []
    dim = len(cents[0])
    bound = quant_bound(dim)
    q = df.select(quantize(F.col(vec_col), scale).alias("q")).persist()
    try:
        qabs = q.agg(F.max(F.greatest(
            F.abs(F.array_max("q")),
            F.abs(F.array_min("q")))).alias("_qabs")).collect()[0]["_qabs"]
        if (qabs or 0) > bound:
            raise ValueError(
                f"quantized magnitude {qabs} exceeds the int64-exact "
                f"bound {bound} for dim={dim}; lower the quantization "
                "scale (integer count features: scale=1) or normalize "
                "the features")
        for _ in range(iters):
            a = q.select(
                kmeans_assign(F.col("q"), cents, pre_quantized=True)
                .alias("cell"), "q")
            stats = {
                r["cell"]: r
                for r in a.groupBy("cell").agg(
                    F.count(F.lit(1)).alias("cnt"),
                    *[F.expr(f"sum(q[{i}]) AS s{i}")  # 1 py4j call per dim
                      for i in range(dim)]).collect()
            }
            cents = [
                [math.floor(float(stats[c][f"s{i}"]) / stats[c]["cnt"])
                 for i in range(dim)] if c in stats else cents[c]
                for c in range(len(cents))
            ]
    finally:
        q.unpersist()
    return cents


def centroid_hash(centroid: list) -> str:
    """md5 over the comma-joined int centroid — the cross-engine
    checksum (DuckDB: ``md5(array_to_string(cv, ','))``)."""
    return hashlib.md5(",".join(str(int(v)) for v in centroid)
                       .encode()).hexdigest()


def kmeans_cell_stats(df: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding", k: int = 8,
                      iters: int = 3) -> DataFrame:
    """Fit + final assignment, aggregated per cell with the centroid
    checksum — the trainer's audit surface (balance check + a hash that
    pins the exact centroids across engines)."""
    cents = kmeans_fit(df, id_col, vec_col, k, iters)
    if not cents:
        return df.select(
            F.lit(0).cast("long").alias("cell"),
            F.lit(0).cast("long").alias("n_vecs"),
            F.col(id_col).alias("min_vec_id"),
            F.lit("").alias("centroid_hash")).limit(0)
    hashes = F.array(*[F.lit(centroid_hash(c)) for c in cents])
    return (df
            .select(F.col(id_col).alias("min_vec_id"),
                    kmeans_assign(F.col(vec_col), cents).alias("cell"))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.min("min_vec_id").alias("min_vec_id"))
            .withColumn("centroid_hash",
                        F.element_at(hashes, (F.col("cell") + 1)
                                     .cast("int"))))


def pq_fit(df: DataFrame, id_col: str = "vec_id",
           vec_col: str = "embedding", m: int = 4, k: int = 16,
           iters: int = 2, scale: int = QUANT_SCALE) -> list:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    vector into ``m`` contiguous subspaces and run the same
    deterministic quantized Lloyd iteration on every slice — jointly.
    Returns ``m`` codebooks of ``k`` integer centroids each (or ``[]``
    on an empty table). PQ compresses a dim-D float vector to ``m``
    small codes (m=8, k=16 -> 32 bits/vector vs 2048 for dim=64
    floats) — the storage tier under an IVF coarse quantizer.

    Scale shape — the corpus is touched ONCE per iteration for ALL
    subspaces, not ``m`` times: the quantized projection persists
    across the whole fit, each iteration computes the ``m`` independent
    assignments in one codegen projection, and all ``m·k·(sub+1)``
    update sums land in a single groupless aggregate (map-side
    combined; the SQL text is built once so expression construction is
    one py4j round-trip — the k-means literal lesson). Per-subspace
    math is identical to ``kmeans_fit`` (same quantize/floor/seed
    conventions), so the m-independent DuckDB twin chains reproduce
    the books bit-for-bit."""
    first = df.select(vec_col).head(1)
    if not first:
        return []
    dim = len(first[0][0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    bound = quant_bound(sub)
    q = df.select(F.col(id_col).alias("_id"),
                  quantize(F.col(vec_col), scale).alias("q")).persist()
    try:
        init = q.orderBy("_id").limit(k).select("q").collect()
        if not init:
            return []
        books = [[[int(v) for v in r["q"][s * sub:(s + 1) * sub]]
                  for r in init] for s in range(m)]
        qabs = q.agg(F.max(F.greatest(
            F.abs(F.array_max("q")),
            F.abs(F.array_min("q")))).alias("_a")).collect()[0]["_a"]
        if (qabs or 0) > bound:
            raise ValueError(
                f"quantized magnitude {qabs} exceeds the int64-exact "
                f"bound {bound} for sub-dim={sub}; lower the scale or "
                "normalize the features")
        for _ in range(iters):
            # one row per (vector, subspace): the m assignments are
            # computed in one codegen projection, the explode carries
            # only the sub-slice, and the update is ONE narrow
            # map-side-combined groupBy over the tiny (m·k) key space —
            # a flat m·k·(sub+1)-column groupless aggregate instead
            # compiles a 1000+-expression class (measured 15s/iter at
            # m=8, k=16; this shape runs the iteration in ~2s)
            ex = q.select(F.explode(F.array(*[
                F.struct(
                    F.lit(s).alias("s"),
                    kmeans_assign(F.slice(F.col("q"), s * sub + 1, sub),
                                  books[s], pre_quantized=True)
                    .alias("cell"),
                    F.slice(F.col("q"), s * sub + 1, sub).alias("sv"))
                for s in range(m)])).alias("e"))
            stats = ex.groupBy(F.col("e.s").alias("s"),
                               F.col("e.cell").alias("cell")).agg(
                F.count(F.lit(1)).alias("cnt"),
                *[F.expr(f"sum(e.sv[{j}]) AS v{j}")
                  for j in range(sub)]).collect()
            look = {(r["s"], r["cell"]): r for r in stats}
            books = [
                [[math.floor(float(look[(s, c)][f"v{j}"])
                             / look[(s, c)]["cnt"])
                  for j in range(sub)]
                 if (s, c) in look else books[s][c]
                 for c in range(len(books[s]))]
                for s in range(m)]
    finally:
        q.unpersist()
    return books


def pq_code(vec: Column, books: list, scale: int = QUANT_SCALE) -> Column:
    """Packed PQ code: ``sum_s code_s * k^s`` — one BIGINT carrying all
    ``m`` subspace assignments (code_s = first-min-wins argmin against
    codebook s, the ``kmeans_assign`` contract). Pure JVM codegen."""
    k = len(books[0])
    sub = len(books[0][0])
    code = F.lit(0).cast("long")
    for s, book in enumerate(books):
        a = kmeans_assign(F.slice(vec, s * sub + 1, sub), book,
                          scale=scale)
        code = code + a * F.lit(k ** s).cast("long")
    return code


def pq_codes(df: DataFrame, books: list, id_col: str = "vec_id",
             vec_col: str = "embedding",
             scale: int = QUANT_SCALE) -> DataFrame:
    """(vec_id, pq_code) — the encoded corpus artifact. One narrow
    zero-shuffle projection; at 10^12 vectors this is the table you
    persist (8 bytes/vector) while the float embeddings stay cold."""
    return df.select(F.col(id_col).alias("vec_id"),
                     pq_code(F.col(vec_col), books, scale)
                     .alias("pq_code"))


def pq_topk(df: DataFrame, books: list, query_vec: list,
            k_results: int = 10, id_col: str = "vec_id",
            vec_col: str = "embedding",
            scale: int = QUANT_SCALE) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query stays un-quantized to
    codes — its exact int64 squared distance to every codebook centroid
    is precomputed DRIVER-SIDE into ``m`` tiny lookup tables (pure
    Python ints, same floor quantization as the data path), and each
    row's approximate distance is ``m`` array lookups + an integer sum.
    Returns (vec_id, pq_dist) — top ``k_results`` by (pq_dist, vec_id),
    TakeOrdered, never a global sort.

    Everything is exact int64 (asserted against ``quant_bound``), so
    the ranking — including ties — is bit-identical cross-engine."""
    m = len(books)
    sub = len(books[0][0])
    bound = quant_bound(sub)
    qq = [math.floor(float(x) * scale) for x in query_vec]
    if max(abs(v) for v in qq) > bound:
        raise ValueError("query magnitude exceeds the int64-exact bound")
    adc = [[sum((qq[s * sub + j] - c[j]) ** 2 for j in range(sub))
            for c in book] for s, book in enumerate(books)]
    assert all(d < 2 ** 63 for row in adc for d in row)
    dist = F.lit(0).cast("long")
    for s, book in enumerate(books):
        a = kmeans_assign(F.slice(F.col(vec_col), s * sub + 1, sub),
                          book, scale=scale)
        dist = dist + F.element_at(
            F.lit(adc[s]).cast("array<long>"), (a + 1).cast("int"))
    return (df.select(F.col(id_col).alias("vec_id"),
                      dist.alias("pq_dist"))
            .orderBy("pq_dist", "vec_id").limit(k_results))


def ivfpq_topk(df: DataFrame, coarse: list, books: list, query_vec: list,
               n_probe: int = 2, k_results: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               scale: int = QUANT_SCALE) -> DataFrame:
    """IVF+PQ search (the full FAISS IVFPQ shape): the coarse k-means
    quantizer prunes the corpus to the ``n_probe`` cells nearest the
    query, then PQ ADC ranks only the survivors. Probe cells are picked
    DRIVER-SIDE with the same exact int64 arithmetic as the data path
    (ties by cell id), so the pruned set — and therefore the result —
    is deterministic cross-engine.

    Scale shape: at production scale the corpus is STORED partitioned
    by coarse cell, so the probe filter is partition pruning (reads
    n_probe/k of the data); scoring is the PQ lookup projection +
    TakeOrdered. Recall knob = ``n_probe`` (same contract as the IVF
    and multi-probe LSH tiers)."""
    qq = [math.floor(float(x) * scale) for x in query_vec]
    cd = sorted((sum((qq[i] - c[i]) ** 2 for i in range(len(c))), cid)
                for cid, c in enumerate(coarse))
    cells = [cid for _, cid in cd[:n_probe]]
    pruned = df.filter(
        kmeans_assign(F.col(vec_col), coarse, scale=scale).isin(cells))
    return pq_topk(pruned, books, query_vec, k_results=k_results,
                   id_col=id_col, vec_col=vec_col, scale=scale)


def text_feature_vec(text: Column, dim: int = 32) -> Column:
    """Hashed bag-of-words count vector (array<float>) for documents
    that have no learned embedding — the featurizer that lets the
    SemDedup stage run inside the text curation ladder. UNIGRAMS only
    (md5 token hash folded to ``dim`` slots): the vector must be
    order-free so reordered/paraphrase-shaped duplicates — the ones
    shingle-Jaccard misses by construction — collide at cosine ~1.
    All JVM codegen."""
    from .lm import tokens_lower
    from .text import bind_array

    def _counts(buckets: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.size(F.filter(buckets, lambda b: b == d.cast("long")))
            .cast("float"))

    buckets = F.transform(
        tokens_lower(text),
        lambda t: F.pmod(F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
                         .cast("long"), F.lit(dim)))
    return bind_array(buckets, _counts)


def semdedup_stage(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: int | None = None,
                   iters: int = 2, threshold: float = 0.95, dim: int = 256,
                   max_cell: int = SEMDEDUP_MAX_CELL) -> DataFrame:
    """SemDedup over raw text: featurize (hashed BoW) -> k-means ->
    within-cell cosine drop. Catches what shingle-Jaccard near-dedup
    misses (reordered/paraphrase-shaped duplicates share a bag of words
    but few 3-shingles). Returns (id, cell, keep); empty/degenerate
    input keeps everything.

    ``k=None`` (default) scales the cell count to the corpus:
    ``ceil(n / SEMDEDUP_TARGET_CELL)`` clamped to [16, 1024] — the
    within-cell self-join and its occupancy aggregation hash on the
    cell id, so k IS the stage's parallelism ceiling; a fixed small k
    caps a 1000-executor cluster at k tasks each holding ~n/k rows.
    Production SemDedup runs k in the 10^4-10^5 range: beyond the
    1024-centroid plan-literal clamp, train centroids offline (the IVF
    path) and call ``semdedup_keep`` with them directly.

    The hashed-BoW features are exact integer counts, so k-means runs
    at ``scale=1`` — scaling counts by 10^6 overflows the int64 exact
    distance once a per-slot count difference reaches ~3036 (very long
    or highly repetitive docs); ``kmeans_fit`` asserts the bound.

    Defaults calibrated on the synthetic extraction corpus: dim=256
    keeps hash collisions rare enough that only template-level
    duplicates cross 0.95 (32 dims folds everything together and the
    stage over-drops); raise ``dim`` with vocabulary size."""
    feats = df.select(F.col(id_col).alias("vec_id"),
                      text_feature_vec(
                          F.coalesce(F.col(text_col), F.lit("")), dim)
                      .alias("embedding"))
    if k is None:
        n = feats.count()
        k = min(max(16, -(-n // SEMDEDUP_TARGET_CELL)), 1024)
    cents = kmeans_fit(feats, k=k, iters=iters, scale=1)
    if not cents:
        return df.select(F.col(id_col),
                         F.lit(0).cast("long").alias("cell"),
                         F.lit(True).alias("keep"))
    out = semdedup_keep(feats, cents, threshold=threshold,
                        max_cell=max_cell, scale=1)
    return out.withColumnRenamed("vec_id", id_col)


def semdedup_keep(df: DataFrame, centroids: list, threshold: float = 0.3,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  max_cell: int = SEMDEDUP_MAX_CELL,
                  scale: int = QUANT_SCALE) -> DataFrame:
    """SemDedup verdict per vector: ``keep = false`` iff a same-cell
    vector with a smaller id has cosine >= threshold (keep-earliest, the
    repo-wide dedup convention). Returns (vec_id, cell, keep).

    The self-join shuffles on the cell id only; cells over ``max_cell``
    rows are exempted from dropping (cap before the quadratic join,
    same pattern as ``cosine_near_dup_pairs``). Cosine runs on the
    ORIGINAL float vectors through the bit-exact Arrow kernel
    (``similarity.cosine_pair``), rounded to 6 dp at the contract
    surface like every other similarity query.
    """
    from .util import drop_overcap_keys

    mem = df.select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).alias("vec"),
                    kmeans_assign(F.col(vec_col), centroids,
                                  scale=scale).alias("cell"))
    # aggregate + broadcast anti-join (util.drop_overcap_keys): the
    # over-full cell is exempted map-side without ever being buffered in
    # one window task.
    capped = drop_overcap_keys(mem, "cell", max_cell)
    a, b = capped.alias("a"), capped.alias("b")
    drops = (a.join(b, "cell")
             .filter(F.col("a.vec_id") < F.col("b.vec_id"))
             .filter(F.round(cosine_pair(F.col("a.vec"), F.col("b.vec")), 6)
                     >= threshold)
             .select(F.col("b.vec_id").alias("vec_id"))
             .distinct()
             .withColumn("_dropped", F.lit(True)))
    return (mem.join(drops, "vec_id", "left")
            .select("vec_id", "cell",
                    F.col("_dropped").isNull().alias("keep")))


def pca_power_loadings(df: DataFrame, vec_col: str = "embedding",
                       iters: int = 6,
                       scale: int = QUANT_SCALE) -> list[float]:
    """Power-iteration estimate of the dominant principal component of
    an embedding column, by exact distributed covariance + driver-side
    iteration — the whitening/compression diagnostic run before
    trusting PQ subspace splits or random-projection LSH (a single
    dominant direction makes sign-bit buckets degenerate).
    Convergence is governed by the eigengap: the angle to the true
    eigenvector shrinks as (λ2/λ1)^iters, so on a corpus with a real
    dominant direction a handful of steps suffice, while on a
    near-isotropic corpus the iterate is reported as-is (still
    deterministic and twin-exact) and its meaning is "no dominant
    direction" — exactly the diagnostic answer the caller needs.

    Exactness: the scaled covariance ``M = n·S - s·sᵀ`` (S = second
    moment, s = column sums over quantized int64 vectors) is computed
    as EXACT integers — DECIMAL(38,0) sums, no mean subtraction in
    floating point, order-independent — so the matrix is bit-identical
    under any partitioning. |M| <= n²·(scale·|x|)²·dim stays inside
    DECIMAL(38,0) up to ~10^12 unit-range rows. The power iteration
    runs on the driver over the collected 64x64 matrix in IEEE doubles
    with a PINNED fold order (left-assoc over j, then one max-abs
    normalization per step) — the DuckDB twin replays the identical op
    sequence, so the loadings are bit-exact cross-engine.

    Scale shape: ONE corpus pass — posexplode to (i, qi) rows (dim x),
    per-row products for the UPPER TRIANGLE only (j >= i, half the
    decimal work; the driver mirrors the exact-integer symmetry), one
    map-side-combined groupBy(i) shipping dim·(dim+2)/2-ish decimals
    to the driver (the k-means-stats bounded-collect precedent);
    iterations touch only the driver-side dim² matrix. Returns [] on
    an empty table."""
    row0 = df.select(vec_col).limit(1).collect()
    if not row0 or row0[0][0] is None:
        return []
    dim = len(row0[0][0])
    bound = math.isqrt(2 ** 63 - 1)  # per-element product must fit int64
    q = df.select(quantize(F.col(vec_col), scale).alias("q"))
    ex = q.select(F.posexplode("q").alias("i", "qi"), "q")
    # covariance symmetry: each exploded row computes products only for
    # j >= i (the slice from its own position) — half the decimal work;
    # the driver mirrors the exact-integer upper triangle. Offsets past
    # a group's slice length read NULL via try_element_at (ANSI-safe).
    pr = ex.select(
        "i", F.col("qi").cast("decimal(38,0)").alias("qi_d"),
        F.abs("qi").alias("qa"),
        F.transform(F.slice("q", F.col("i") + 1, F.lit(dim)),
                    lambda x: (x * F.col("qi"))
                    .cast("decimal(38,0)")).alias("p"))
    stats = pr.groupBy("i").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("qa").alias("qabs"),
        F.sum("qi_d").alias("s1"),
        *[F.expr(f"sum(try_element_at(p, {k + 1})) AS s2_{k}")
          for k in range(dim)]).collect()  # 1 py4j call per dim
    if not stats:
        return []
    by_i = {r["i"]: r for r in stats}
    qabs = max(int(r["qabs"]) for r in stats)
    if qabs > bound:
        raise ValueError(
            f"quantized magnitude {qabs} exceeds the int64-exact product "
            f"bound {bound}; lower the quantization scale or normalize")
    n = int(by_i[0]["cnt"])
    s = [int(by_i[i]["s1"]) for i in range(dim)]
    upper = [[n * int(by_i[i][f"s2_{j - i}"]) - s[i] * s[j]
              for j in range(i, dim)] for i in range(dim)]
    m = [[upper[i][j - i] if j >= i else upper[j][i - j]
          for j in range(dim)] for i in range(dim)]
    v = [1.0] * dim
    for _ in range(iters):
        w = []
        for i in range(dim):
            acc = 0.0
            for j in range(dim):  # left-assoc fold, j ascending (== twin)
                acc = acc + float(m[i][j]) * v[j]
            w.append(acc)
        mx = 0.0
        for x in w:
            mx = max(mx, abs(x))
        v = [x / mx for x in w] if mx > 0 else w
    return v


# ---------------------------------------------------------------------------
# SSL-prototype data pruning (X161)
# ---------------------------------------------------------------------------

def prototype_prune(df: DataFrame, centroids: list, drop_pct: int = 25,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    scale: int = QUANT_SCALE) -> DataFrame:
    """Prototypicality pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws"): score every vector by its exact int64 squared
    distance to its ASSIGNED k-means centroid — close to the prototype
    = easy/redundant, far = hard/informative — and DROP the easiest
    ``drop_pct`` percent of each cell, keeping the hard examples the
    paper shows beat random subsets at scale.

    The per-cell threshold comes from the (cell, octave, sub) HDR
    histogram (``sketch.hist_buckets``), NOT a per-cell sort: threshold
    = bucket_lo of the first bucket whose cumulative count crosses the
    drop target (integer compare ``100·cum > pct·total``), and rows
    with dist >= threshold keep. Bucket granularity under-drops by at
    most one bucket (the X79 1/8-relative bound) and never overshoots
    the target; ties at the boundary keep — deterministic.

    Returns (id, cell, sqdist, keep).

    Scale shape: assignment + distance is the O(1)-in-k codegen
    projection ``kmeans_assign`` uses; the histogram is ONE map-side
    combined groupBy over <= k·64·8 bucket keys at ANY corpus size;
    thresholds fold over the bounded per-cell bucket list and broadcast
    back — no window, no per-cell sort, parallelism never pinned at k
    (the round-3 SemDedup lesson)."""
    from .sketch import hist_buckets

    if not centroids:
        raise ValueError("prototype_prune needs fitted centroids")
    cents = (F.lit([[int(v) for v in c] for c in centroids])
             .cast("array<array<long>>"))
    base = df.select(F.col(id_col).alias("vec_id"),
                     quantize(F.col(vec_col), scale).alias("_q"))
    base = base.withColumn(
        "cell", kmeans_assign(F.col("_q"), centroids, pre_quantized=True))
    own = F.element_at(cents, (F.col("cell") + 1).cast("int"))
    dist = bind_array(
        F.col("_q"),
        lambda qv: bind_array(own, lambda c: _sq_dist(qv, c)))
    scored = base.select("vec_id", "cell", dist.alias("sqdist"))
    hist = (hist_buckets(scored, F.col("sqdist"))
            .groupBy("cell", "octave", "sub", "bucket_lo")
            .agg(F.count(F.lit(1)).alias("n")))
    per = hist.groupBy("cell").agg(
        F.sum("n").alias("_tot"),
        F.sort_array(F.collect_list(
            F.struct("octave", "sub", "bucket_lo", "n"))).alias("_bk"))
    zero = F.struct(F.lit(0).cast("long").alias("cum"),
                    F.lit(-1).cast("long").alias("thr"))

    def _step(acc, x):
        newcum = acc["cum"] + x["n"]
        crossed = F.lit(100) * newcum > F.lit(drop_pct) * F.col("_tot")
        thr = (F.when(acc["thr"] >= 0, acc["thr"])
               .otherwise(F.when(crossed, x["bucket_lo"])
                          .otherwise(F.lit(-1).cast("long"))))
        return F.struct(newcum.alias("cum"), thr.alias("thr"))

    thresholds = per.select(
        "cell", F.aggregate("_bk", zero, _step)["thr"].alias("_thr"))
    return (scored.join(F.broadcast(thresholds), "cell")
            .select("vec_id", "cell", "sqdist",
                    (F.col("sqdist") >= F.col("_thr")).alias("keep")))


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (X171) — the production-default compression
# ---------------------------------------------------------------------------

def sq8_bounds(df: DataFrame, vec_col: str = "embedding") -> tuple:
    """Per-dimension (min, max) of the corpus, as python lists (2·dim
    doubles to the driver — bounded). min/max are EXACT over doubles,
    so the driver-side literals equal what any engine computes from
    the same bytes."""
    ex = df.select(F.posexplode(F.col(vec_col)).alias("i", "x"))
    rows = (ex.groupBy("i")
            .agg(F.min(F.col("x").cast("double")).alias("mn"),
                 F.max(F.col("x").cast("double")).alias("mx"))
            .orderBy("i").collect())
    return ([float(r["mn"]) for r in rows],
            [float(r["mx"]) for r in rows])


def sq8_code_expr(vec: Column, mins: list, maxs: list) -> Column:
    """array<float> -> array<int> 8-bit codes: per dim,
    floor(((x - mn) * 255.0) / (mx - mn)) clamped to [0, 255]
    (degenerate dims -> 0). The float op ORDER is part of the contract
    — the twin and the driver-side query encoder run the identical
    sequence, so codes are bit-identical everywhere."""
    mn = F.lit(mins)
    mx = F.lit(maxs)

    def _code(x: Column, i: Column) -> Column:
        a = F.element_at(mn, i + 1)
        b = F.element_at(mx, i + 1)
        raw = F.floor(((x.cast("double") - a) * F.lit(255.0)) / (b - a))
        return (F.when(b == a, F.lit(0))
                .otherwise(F.least(F.lit(255),
                                   F.greatest(F.lit(0),
                                              raw.cast("int")))).cast("int"))

    return F.transform(vec, _code)


def sq8_encode_py(vec: list, mins: list, maxs: list) -> list:
    """Driver-side twin of sq8_code_expr (query-vector encoding)."""
    out = []
    for x, a, b in zip(vec, mins, maxs):
        if b == a:
            out.append(0)
        else:
            out.append(max(0, min(255, math.floor(
                ((float(x) - a) * 255.0) / (b - a)))))
    return out


def sq16_encode_py(vec: list, mins: list, maxs: list) -> list:
    """16-bit query-side encoding for the ASYMMETRIC distance (X180):
    same affine map as sq8_encode_py at 65535 steps — the query-side
    quantization error becomes negligible (1/257 of a corpus step)
    while the arithmetic stays on an exact integer grid."""
    out = []
    for x, a, b in zip(vec, mins, maxs):
        if b == a:
            out.append(0)
        else:
            out.append(max(0, min(65535, math.floor(
                ((float(x) - a) * 65535.0) / (b - a)))))
    return out


def sq8_asym_topk(df: DataFrame, mins: list, maxs: list, qvec: list,
                  k_results: int = 10, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """X180 — asymmetric SQ top-k (the FAISS SQ ADC idea): the CORPUS
    stays 8-bit, only it pays quantization error; the query is encoded
    at 16-bit on the same per-dim affine grid and corpus codes are
    lifted onto it exactly (c*257, since 255*257 = 65535) — so the
    distance is float-query-fidelity up to 1/257 of a corpus step yet
    every arithmetic op is exact int64 (per-dim diff <= 65535, squared
    4.3e9, far under the _sq_dist bound), bit-identical across engines
    and partitionings. Same scan shape as sq8_topk: narrow codegen
    projection + TakeOrdered(k) on (dist, id)."""
    q16 = sq16_encode_py(qvec, mins, maxs)
    codes = sq8_code_expr(F.col(vec_col), mins, maxs)
    d = df.select(F.col(id_col),
                  bind_array(
                      codes,
                      lambda c: _sq_dist(
                          F.transform(c, lambda x: (x * 257).cast("long")),
                          F.lit([int(v) for v in q16])
                          .cast("array<long>"))).alias("asq_dist"))
    return (d.orderBy(F.col("asq_dist").asc(), F.col(id_col).asc())
            .limit(k_results))


def sq8_topk(df: DataFrame, mins: list, maxs: list, qvec: list,
             k_results: int = 10, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Brute-force top-k over SQ8 codes: exact int64 squared L2 between
    8-bit codes (max dim·255² ≈ 4.2M·dim — overflow-free for any real
    dim), TakeOrdered(k) on (dist, id) so ties are total. Codes are
    1/4 the float32 bytes; at 10^12 vectors this is the scan-side
    memory story (the IVF/PQ tiers are the pruning story)."""
    qcodes = sq8_encode_py(qvec, mins, maxs)
    codes = sq8_code_expr(F.col(vec_col), mins, maxs)
    d = df.select(F.col(id_col),
                  bind_array(
                      codes,
                      lambda c: _sq_dist(
                          F.transform(c, lambda x: x.cast("long")),
                          F.lit([int(v) for v in qcodes])
                          .cast("array<long>"))).alias("sq_dist"))
    return (d.orderBy(F.col("sq_dist").asc(), F.col(id_col).asc())
            .limit(k_results))
