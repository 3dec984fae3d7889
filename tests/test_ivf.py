"""IVF ANN tests — the coarse-quantizer scale path (operators/similarity.py
ivf_train / ivf_topk).

Determinism is the design center: all k-means arithmetic is int64
micro-units (order-free sums), so training is independent of partitioning;
these tests pin that plus recall against the exact brute-force baseline.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.operators.similarity import brute_force_topk, ivf_topk, ivf_train

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _clustered_vectors(n_per=40, n_clusters=4, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (n_clusters, dim))
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(n_per):
            v = centers[c] + rng.normal(0, 0.05, dim)
            rows.append((vid, [float(x) for x in v.astype(np.float32)]))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def vectors(spark):
    df = spark.createDataFrame(_clustered_vectors(), VEC_SCHEMA)
    df.persist().count()
    return df


def test_ivf_train_deterministic_across_partitioning(spark, vectors):
    c1 = ivf_train(vectors.repartition(1), n_centroids=4, iters=3)
    c2 = ivf_train(vectors.repartition(13), n_centroids=4, iters=3)
    assert c1 == c2  # integer sums are order-free: partitioning-independent


def test_ivf_train_separates_clusters(spark, vectors):
    cents = ivf_train(vectors, n_centroids=4, iters=4)
    # with well-separated synthetic clusters, the 4 centroids are distinct
    assert len({tuple(c) for c in cents}) == 4


def test_ivf_topk_recall_vs_brute_force(spark, vectors):
    queries = vectors.filter(F.col("vec_id") % 40 == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(vectors, queries, k=5).collect()
    approx = ivf_topk(vectors, queries, k=5, n_centroids=4, nprobe=2, iters=3).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.95  # tight clusters: probing 2/4 cells finds the true top-5


def test_ivf_empty_cell_keeps_previous_centroid(spark):
    # 3 identical vectors + 4 requested centroids → at least one empty cell;
    # training must not crash and must return n_centroids centroids
    rows = [(i, [1.0] * 8) for i in range(3)]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    cents = ivf_train(df, n_centroids=3, iters=2)
    assert len(cents) == 3


def test_ivf_probe_join_is_equi_join(spark, vectors):
    queries = vectors.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = (
        ivf_topk(vectors, queries, k=3, n_centroids=4, nprobe=2, iters=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
