"""t1: materialized result cache (A25) — hit/miss and semantic keying."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_model_vectorsearch_spark.plans.cache import (
    cached_result,
    plan_fingerprint,
)


def test_cache_miss_then_hit(tables, tmp_path):
    cdir = str(tmp_path / "cache")
    q = tables["orders"].groupBy("o_orderstatus").count()
    r1, hit1 = cached_result(q, cdir)
    assert not hit1
    r2, hit2 = cached_result(q, cdir)
    assert hit2
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect()))


def test_fingerprint_ignores_aliases(tables):
    a = tables["orders"].select(F.col("o_orderkey"))
    b = tables["orders"].select(F.col("o_orderkey"))
    assert plan_fingerprint(a) == plan_fingerprint(b)


def test_fingerprint_distinguishes_queries(tables):
    a = tables["orders"].select("o_orderkey")
    b = tables["orders"].select("o_custkey")
    assert plan_fingerprint(a) != plan_fingerprint(b)
