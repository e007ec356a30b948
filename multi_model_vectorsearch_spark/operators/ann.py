"""Similarity search over embeddings: exact near-dup pairs and IVF-style ANN.

The exact brute-force path (B47/B49) is the correctness baseline; the IVF
operator is the scale path: assign every vector to its nearest centroid once
(a linear pass over a broadcast centroid set), then answer queries by probing
only the query's cluster. On a 1000-executor cluster the assignment is a
map-only stage and the probe prunes the scan to ~1/n_centroids of the corpus
— the Spark-native equivalent of swapping the reference's FLAT Redis index
(db.py:35) for an IVF one, with no index service at all.

Centroids here are a deterministic subset of the corpus (lowest vec_ids) so
the DuckDB oracle reproduces results exactly; swap in k-means centers for
real workloads (same plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.functions.vector import cosine_similarity

Tables = dict


def dq46_cosine_neardup_topk(t: Tables, k: int = 20) -> DataFrame:
    """Embedding-cosine near-dup: top-k most-similar distinct pairs.

    Self-join keeps only the upper triangle (vec_id ordering) so each pair
    appears once. At scale, replace the cross join with an LSH/IVF candidate
    join (dq47) — the ranking tail of the plan is identical.
    """
    e = t["embeddings"].select("vec_id", "embedding")
    a = e.select(F.col("vec_id").alias("v1"), F.col("embedding").alias("e1"))
    b = e.select(F.col("vec_id").alias("v2"), F.col("embedding").alias("e2"))
    pairs = a.crossJoin(b).filter(F.col("v1") < F.col("v2"))
    sims = pairs.select(
        "v1", "v2",
        F.round(cosine_similarity(F.col("e1"), F.col("e2")), 6).alias("s"),
    )
    return sims.orderBy(F.desc("s"), F.asc("v1"), F.asc("v2")).limit(k)


def assign_clusters(t: Tables, n_centroids: int = 8) -> DataFrame:
    """IVF assignment: nearest centroid per vector (broadcast centroid set)."""
    e = t["embeddings"]
    cents = (
        e.filter(F.col("vec_id") < n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "embedding", "cid",
        F.round(cosine_similarity(F.col("embedding"), F.col("cv")), 6).alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )


def dq51_lsh_ann(t: Tables, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """B54: MLlib random-projection LSH ANN (seeded → reproducible runs).

    The alternative scale path to dq47's IVF: hash buckets prune candidates,
    ``approxNearestNeighbors`` probes them. Approximate algorithms differ by
    engine, so this is a rows-only check (SURVEY.md §5.3 rule 5) — recall
    quality is asserted in t1 tests against the exact KNN instead.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = t["embeddings"].select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=2.0, numHashTables=3, seed=42,
    )
    model = lsh.fit(e)
    key = e.filter(F.col("vec_id") == query_vec_id).head().features
    nn = model.approxNearestNeighbors(e, key, k, distCol="dist")
    return nn.select("vec_id", F.round("dist", 6).alias("dist"))


def dq52_centroid_applyinpandas(t: Tables, dims: int = 4) -> DataFrame:
    """B57: grouped custom aggregation via applyInPandas — per-label centroid.

    The UDAF surface for logic SQL can't express (here it can, which is what
    makes it oracle-checkable — the same Arrow-batched path carries real
    custom aggregations). Rounding happens Spark-side so the Python kernel
    returns raw doubles.
    """
    import numpy as np
    import pandas as pd

    cols = [f"c{i+1}" for i in range(dims)]

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(
            pdf["embedding"].map(lambda a: np.asarray(a, dtype=np.float64))
        )
        mean = mat.mean(axis=0)
        row = {"label": int(pdf["label"].iloc[0])}
        row.update({c: float(mean[i]) for i, c in enumerate(cols)})
        return pd.DataFrame([row])

    schema = "label int, " + ", ".join(f"{c} double" for c in cols)
    out = t["embeddings"].groupBy("label").applyInPandas(centroid, schema=schema)
    return out.select("label", *[F.round(c, 6).alias(c) for c in cols])


def dq47_ivf_knn(t: Tables, query_vec_id: int = 0, k: int = 10,
                 n_centroids: int = 8) -> DataFrame:
    """IVF-style ANN: probe only the query's cluster, exact rank inside it.

    Returns (vec_id, s) like the exact KNN (dq29); recall loss vs exact is
    the IVF trade-off, bounded by probing more clusters.
    """
    assigned = assign_clusters(t, n_centroids)
    q = assigned.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"), F.col("cid").alias("qcid")
    )
    cand = assigned.join(
        F.broadcast(q), assigned.cid == F.col("qcid")
    )
    sims = cand.select(
        "vec_id",
        F.round(cosine_similarity(F.col("embedding"), F.col("qv")), 6).alias("s"),
    )
    return sims.orderBy(F.desc("s"), F.asc("vec_id")).limit(k)
