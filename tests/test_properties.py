"""Property-based tests (hypothesis) for kernels and join rewrites.

Pure-Python kernels get wide random coverage; the Spark property uses few
examples (each example runs real jobs) with deadline disabled.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multi_model_vectorsearch_spark.functions.embedding import hash_embed_text


@given(st.text(max_size=200))
@settings(max_examples=200)
def test_hash_embed_unit_norm_and_determinism(text):
    v1 = hash_embed_text(text)
    v2 = hash_embed_text(text)
    assert v1 == v2
    assert len(v1) == 16
    assert math.isclose(math.fsum(x * x for x in v1), 1.0, rel_tol=1e-9)


@given(st.text(max_size=50), st.text(max_size=50))
@settings(max_examples=100)
def test_hash_embed_distinct_inputs_disagree(a, b):
    if a != b:
        assert hash_embed_text(a) != hash_embed_text(b)


@given(
    st.lists(st.integers(0, 5), min_size=0, max_size=30),
    st.lists(st.integers(0, 5), min_size=0, max_size=10),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_salted_join_property(spark, left_keys, right_keys):
    """salted_join == plain inner join for arbitrary key multisets,
    including hot keys (every left key equal) and empty sides."""
    from multi_model_vectorsearch_spark.operators.scale import salted_join

    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(left_keys)] or [], "k int, lv int"
    )
    right = spark.createDataFrame(
        [(k, i * 10) for i, k in enumerate(right_keys)] or [], "k int, rv int"
    )
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k", n_salts=3).collect()))
    assert salted == plain
