"""Embedding similarity search over array<float> columns.

* :func:`cosine_expr` — dot / (norm·norm) via zip_with + aggregate:
  pure column expressions, whole-stage-codegen'd.
* :func:`brute_force_topk` — exact top-k neighbors for a (small,
  broadcast) query set against N vectors: broadcast nested-loop join +
  per-query window rank.  This is the baseline/oracle path.
* :func:`lsh_topk` — the scale path: random-hyperplane signatures bucket
  the vectors; each query probes only its bucket (plus multi-probe
  neighbors at Hamming distance 1), then exact cosine re-ranks.  Planes
  are a deterministic function of (seed, dim) so results are stable.
* :func:`embedding_near_dup_pairs` — near-duplicate vector pairs above a
  cosine threshold, LSH-bucketed to avoid the O(n²) cross join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F



def _infer_dim(vectors, vec_col: str):
    """Embedding width from the first NON-NULL vector; None when the
    input is empty or all-null (callers return an empty result instead
    of crashing on len(None))."""
    row = vectors.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    return len(row[0]) if row is not None else None

def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query.  The query side is broadcast (it is
    small by contract); the big side streams — no shuffle until the final
    per-query rank, which is tiny (n_queries × N reduced to n_queries × k
    by partial top-k per partition via the window)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    joined = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")).crossJoin(
        F.broadcast(q)
    )
    scored = joined.withColumn(
        "cosine", cosine_expr(F.col("_v").cast("array<double>"), F.col("_qvec").cast("array<double>"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def signature_expr(vec: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane LSH signature as an int (bit i = sign of dot with
    plane i), computed with pure column expressions."""
    bits = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = dot_expr(vec.cast("array<double>"), lit_plane)
        bits.append(F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: classic multi-table hyperplane LSH.  Each of
    ``n_tables`` independent plane sets buckets every vector; a query
    probes its exact bucket plus (multiprobe) all Hamming-1 neighbors in
    each table; the union of candidates is exact-cosine re-ranked.

    Scale shape: the vector side is written once with n_tables bucket
    columns (exploded → n_tables rows per vector); the candidate join is
    an equi-join on (table, bucket) — shuffle-hash, AQE-skew-safe — never
    a cross join.  Recall/cost tunes with (n_planes, n_tables, probes):
    more planes → smaller buckets, more tables/probes → higher recall.
    """
    if dim is None:
        dim = _infer_dim(vectors, vec_col)
        if dim is None:  # empty input / null first vector → empty result
            return vectors.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, cosine double, rank int"
            )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))

    v_buckets = []
    q_probes = []
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed + 1000 * t)
        vsig = signature_expr(F.col("_v"), planes)
        v_buckets.append(F.concat_ws("#", F.lit(t), vsig.cast("string")))
        qsig = signature_expr(F.col("_qvec"), planes)
        sigs = [qsig] + (
            [qsig.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)] if multiprobe else []
        )
        q_probes.extend(F.concat_ws("#", F.lit(t), s.cast("string")) for s in sigs)

    v = v.select("neighbor_id", "_v", F.explode(F.array(*v_buckets)).alias("bucket"))
    q = q.select("query_id", "_qvec", F.explode(F.array(*q_probes)).alias("bucket"))
    cand = v.join(F.broadcast(q), "bucket").dropDuplicates(["query_id", "neighbor_id"]).withColumn(
        "cosine", cosine_expr(F.col("_v").cast("array<double>"), F.col("_qvec").cast("array<double>"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    dim: int | None = None,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Vector pairs with cosine ≥ threshold; LSH-bucketed candidates (same
    signature) verified exactly.  High thresholds → colliding signatures
    with high probability; recall grows with fewer planes."""
    if dim is None:
        dim = _infer_dim(vectors, vec_col)
        if dim is None:
            return vectors.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
    planes = _planes(dim, n_planes, seed)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).withColumn(
        "bucket", signature_expr(F.col("vec"), planes)
    )
    a = v.select(F.col("bucket"), F.col("id").alias("id_a"), F.col("vec").alias("va"))
    b = v.select(F.col("bucket"), F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    cand = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = cand.withColumn(
        "cosine", cosine_expr(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>"))
    )
    return scored.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------
#
# Complements lsh_topk: k-means coarse centroids partition the corpus, each
# query probes only its `nprobe` nearest cells, exact cosine re-ranks.
# Determinism at cluster scale is designed in, not hoped for:
#
# * vectors are quantized ONCE to int64 micro-units; every k-means distance
#   and every centroid sum is INTEGER arithmetic — associative and
#   commutative, so the result is independent of partitioning, task order
#   and engine (the DuckDB oracle replays it exactly);
# * centroid update = floor(sum/count) on the integer sums (exact while
#   |sum| < 2^53 — at 10^10 rows switch the division to DECIMAL, the sums
#   themselves stay exact int64 far beyond that);
# * argmin ties break on the lower centroid id via min-of-struct.
#
# Scale shape: assignment is a stateless column expression (no shuffle);
# the per-iteration centroid update shuffles only (n_centroids × dim)
# partial sums after map-side combine; the probe join is an equi-join on
# cell id — never a cross join.  Centroids (16×64 ints) live on the driver
# like any k-means.


def quantize_expr(vec: Column, scale: float = 1e6) -> Column:
    """int64 micro-unit quantization (round half away from zero — same rule
    in Spark and DuckDB)."""
    return F.transform(vec, lambda x: F.round(x * scale).cast("long"))


def _int_l2sq(qvec: Column, center: list) -> Column:
    arr = F.array(*[F.lit(int(c)) for c in center])
    return F.aggregate(
        F.zip_with(qvec, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign_struct(qvec: Column, centroids: list[list]) -> Column:
    """array_min over (dist, cid) structs — argmin with lower-cid ties."""
    return F.array_min(
        F.array(
            *[
                F.struct(_int_l2sq(qvec, c).alias("d"), F.lit(i).alias("cid"))
                for i, c in enumerate(centroids)
            ]
        )
    )


def ivf_train(
    vectors: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_sample_limit: int = 1 << 18,
) -> list[list]:
    """Deterministic integer k-means: init = the quantized vectors of the
    `n_centroids` smallest ids; `iters` Lloyd rounds with integer sums and
    floor-mean updates; empty cells keep their previous centroid.

    The coarse quantizer trains on ONE deterministic sample (the
    ``train_sample_limit`` smallest ids) collected to the driver, with
    the Lloyd rounds in exact-int64 numpy — the standard IVF design
    (FAISS / MLlib train on a bounded sample; only ASSIGNMENT must be
    distributed, and it is, in :func:`ivf_topk`).  Below the cap this is
    bit-identical to full-data training, which is what the unrolled SQL
    oracle replays.  The previous shape — one Spark job per Lloyd round
    over a 16-centroid × dim literal expression tree — spent ~2 s/round
    on plan+codegen alone (fresh literals every round defeat any plan
    cache) regardless of data size."""
    import numpy as np

    q = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"), quantize_expr(F.col(vec_col)).alias("_qv")
    )
    # Arrow toPandas, not collect(): at the sample cap this is ~262k rows
    # of dim-wide lists — the row-pickling path would build GBs of Python
    # objects just to discard them after the numpy conversion
    pdf = q.orderBy("_id").limit(train_sample_limit).toPandas()
    arr = np.array([list(v) for v in pdf["_qv"]], dtype=np.int64)
    centroids = arr[:n_centroids].copy()
    for _ in range(iters):
        # argmin_c |a-c|² == argmin_c (|c|² − 2·a·c): int64-exact, and
        # numpy argmin's first-minimum rule == the lower-cid tiebreak of
        # the previous array_sort(struct(d, cid)) expression
        cross = arr @ centroids.T
        cnorm = (centroids * centroids).sum(axis=1)
        cid = (cnorm[None, :] - 2 * cross).argmin(axis=1)
        new = centroids.copy()
        for c in range(n_centroids):
            members = arr[cid == c]
            if len(members):
                # floor(double(sum)/count) — replays the SQL oracle's
                # FLOOR(CAST(SUM AS DOUBLE)/COUNT) exactly; sums < 2^53
                new[c] = np.floor(
                    members.sum(axis=0, dtype=np.int64).astype(np.float64)
                    / len(members)
                ).astype(np.int64)
        centroids = new
    return [[int(v) for v in c] for c in centroids]


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 3,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN: train the coarse quantizer, assign every vector to its cell
    (stateless expr), explode each query to its `nprobe` nearest cells, and
    resolve candidates with an equi-join on cell id before the exact cosine
    re-rank (cos DESC, neighbor_id ASC tiebreak, same as brute_force_topk)."""
    centroids = ivf_train(vectors, n_centroids, iters, vec_col, id_col)

    cells = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_v"),
        _assign_struct(quantize_expr(F.col(vec_col)), centroids)["cid"].alias("_cid"),
    )
    qprobe = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.array(
                            *[
                                F.struct(
                                    _int_l2sq(quantize_expr(F.col(vec_col)), c).alias("d"),
                                    F.lit(i).alias("cid"),
                                )
                                for i, c in enumerate(centroids)
                            ]
                        )
                    ),
                    1,
                    nprobe,
                ),
                lambda s: s["cid"],
            )
        ).alias("_cid"),
    )
    scored = cells.join(F.broadcast(qprobe), "_cid").select(
        "query_id", "neighbor_id", cosine_expr(F.col("_v"), F.col("_qvec")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
