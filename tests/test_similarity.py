"""Similarity search engine ops: brute-force exactness + IVF recall."""

import pytest
from pyspark.sql import functions as F

from easyner_spark.ops.similarity import brute_force_knn, ivf_build, ivf_search

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).cache()


@pytest.fixture(scope="module")
def queries(spark, vectors):
    return vectors.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )


def test_brute_force_self_similarity_excluded(vectors, queries):
    out = brute_force_knn(vectors, queries, k=5).collect()
    assert all(r["qid"] != r["cid"] for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    for rows in by_q.values():
        assert len(rows) == 5
        sims = [r["cosine"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert sims == sorted(sims, reverse=True)


def test_ivf_build_shapes(vectors):
    centroids, assignments = ivf_build(vectors, nlist=8)
    assert centroids.count() == 8
    a = assignments.groupBy("list_id").count().collect()
    assert sum(r["count"] for r in a) == vectors.count()
    # every vector assigned exactly once
    assert assignments.select("vec_id").distinct().count() == vectors.count()


def test_ivf_recall_improves_with_nprobe(vectors, queries):
    exact = {
        (r["qid"], r["cid"])
        for r in brute_force_knn(vectors, queries, k=5).collect()
    }
    centroids, assignments = ivf_build(vectors, nlist=8)

    def recall(nprobe):
        got = {
            (r["qid"], r["cid"])
            for r in ivf_search(
                vectors, centroids, assignments, queries, k=5, nprobe=nprobe
            ).collect()
        }
        return len(got & exact) / len(exact)

    r2, r8 = recall(2), recall(8)
    assert r8 >= r2  # probing more lists never hurts recall
    assert r8 == 1.0  # nprobe == nlist degenerates to exact search
    assert r2 > 0.2  # coarse quantizer still finds a useful fraction
