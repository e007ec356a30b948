"""Materialized result caching (A25 — claimed by the reference, absent in code).

The reference's Readme claims "result caching in Redis for low latency"
(Readme.md:11) but implements no cache read/write anywhere. Here the claim
becomes real: a query's canonicalized logical plan fingerprints its result;
the first run materializes to parquet, later runs with an identical plan read
the materialization. Because the key is the *canonicalized* plan, alias
renames and column reorderings that don't change semantics still hit.

At scale this is a result-table memo for expensive repeated subqueries
(signature tables, edge lists) — the Spark-native shape of a serving cache,
minus a TTL/invalidations layer (drop the cache dir on source refresh).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame


def plan_fingerprint(df: DataFrame) -> str:
    """Stable key: sha256 of the canonicalized analyzed logical plan."""
    canon = df._jdf.queryExecution().analyzed().canonicalized().toString()
    return hashlib.sha256(canon.encode()).hexdigest()[:16]


def cached_result(df: DataFrame, cache_dir: str) -> tuple[DataFrame, bool]:
    """Return (result_df, was_hit); materializes on miss.

    The success marker (parquet's _SUCCESS) gates reads so a crashed write
    never serves a partial result. The cache dir goes through the same
    StateFS adapter as the ingest state, so an ``hdfs://``/``s3a://``
    cache root works with whatever credentials the Spark conf carries
    (the marker-gated overwrite needs no atomic rename — parquet's own
    job commit is the write barrier).
    """
    from multi_model_vectorsearch_spark.streaming.statefs import statefs_for

    spark = df.sparkSession
    fs = statefs_for(spark, cache_dir)
    key = plan_fingerprint(df)
    path = fs.join(cache_dir, key)
    if fs.isfile(fs.join(path, "_SUCCESS")):
        return spark.read.parquet(path), True
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), False
