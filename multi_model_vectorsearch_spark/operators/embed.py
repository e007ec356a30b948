"""Embedding-pipeline operators: the pandas-UDF surface as declared queries.

dq48 runs the deterministic stand-in embedder (functions/embedding.py) over
``documents`` and projects invariants (dim, first component, unit norm) that
the DuckDB oracle reproduces exactly — making even the Python-UDF boundary
hash-checkable. The production CLIP path shares this plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.functions.embedding import hash_embed_udf
from multi_model_vectorsearch_spark.functions.fixedpoint import snap
from multi_model_vectorsearch_spark.functions.vector import l2_norm

Tables = dict


def embed_documents(t: Tables) -> DataFrame:
    """documents + an ``embedding`` column from the scalar-iterator UDF."""
    d = t["documents"]
    return d.withColumn("embedding", hash_embed_udf("text"))


def dq48_embed_stub(t: Tables) -> DataFrame:
    """B56: UDF output invariants — dimension, e1 component, unit norm."""
    emb = embed_documents(t)
    return emb.select(
        "doc_id",
        F.size("embedding").cast("int").alias("dim"),
        snap(F.element_at("embedding", 1)).alias("e1_micro"),
        snap(l2_norm(F.col("embedding"))).alias("one_micro"),
    )


def dq49_embed_knn(t: Tables, query_doc_id: int = 0, k: int = 10) -> DataFrame:
    """End-to-end `/search` analog: embed text with the UDF, then exact KNN.

    The reference pipeline embed→KNN (main.py:98-118) as one plan: the UDF
    stage feeds the cosine top-k directly — no service hop, no index.
    """
    from multi_model_vectorsearch_spark.functions.vector import cosine_similarity

    emb = embed_documents(t).select("doc_id", "embedding")
    q = emb.filter(F.col("doc_id") == query_doc_id).select(
        F.col("embedding").alias("qv")
    )
    sims = emb.crossJoin(F.broadcast(q)).select(
        "doc_id",
        snap(cosine_similarity(F.col("embedding"), F.col("qv")))
        .alias("s_micro"),
    )
    return sims.orderBy(F.desc("s_micro"), F.asc("doc_id")).limit(k)
