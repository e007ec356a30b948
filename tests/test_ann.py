"""t1 invariants for approximate ANN (dq51) — SURVEY.md §5.3 rule 5.

Approx operators are excluded from the oracle hash set; instead we assert
recall against the exact scan, determinism (seeded LSH), and basic shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_model_vectorsearch_spark.operators.ann import dq51_lsh_ann


def _exact_l2_topk(tables, query_vec_id: int, k: int) -> list[int]:
    e = tables["embeddings"]
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                "embedding", "qv",
                lambda x, y: (x.cast("double") - y.cast("double")) ** 2,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    rows = (
        e.crossJoin(q)
        .select("vec_id", dist.alias("d"))
        .orderBy("d", "vec_id")
        .limit(k)
        .collect()
    )
    return [r.vec_id for r in rows]


def test_lsh_ann_recall_and_shape(tables):
    k = 10
    got = dq51_lsh_ann(tables, query_vec_id=0, k=k).collect()
    assert len(got) == k
    # query point is its own nearest neighbor at distance 0
    assert got[0].vec_id == 0 and got[0].dist == 0.0
    # distances are sorted ascending
    dists = [r.dist for r in got]
    assert dists == sorted(dists)
    # recall vs the exact Euclidean scan: LSH prunes, so allow misses,
    # but a majority of the true top-k must survive
    exact = set(_exact_l2_topk(tables, 0, k))
    overlap = len(exact & {r.vec_id for r in got})
    assert overlap >= k // 2, f"LSH recall too low: {overlap}/{k}"


def test_lsh_ann_deterministic(tables):
    a = [(r.vec_id, r.dist) for r in dq51_lsh_ann(tables, 0, 5).collect()]
    b = [(r.vec_id, r.dist) for r in dq51_lsh_ann(tables, 0, 5).collect()]
    assert a == b


def test_ivf_recall_vs_exact(tables):
    """dq47 IVF probes one cluster; recall vs exact cosine KNN stays high
    for the self-query (the query's own cluster holds its neighborhood)."""
    from multi_model_vectorsearch_spark.operators.ann import dq47_ivf_knn
    from multi_model_vectorsearch_spark.operators.vector_ops import (
        dq29_knn_topk,
    )

    exact = {r.vec_id for r in dq29_knn_topk(tables, 0, 10).collect()}
    ivf = {r.vec_id for r in dq47_ivf_knn(tables, 0, 10).collect()}
    assert 0 in ivf  # query itself survives the probe
    assert len(ivf & exact) >= 3, (ivf, exact)
