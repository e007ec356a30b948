"""B56 embedding surface: modality routing (incl. the reference's audio
pass-through quirk, vec.py:16-22) and the gated CLIP production path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.functions.embedding import (
    CLIP_DIM,
    clip_embed_udf,
    route_embedding,
    route_embedding_local,
)


def _torch_available() -> bool:
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
        return True
    except ImportError:
        return False


def test_audio_routes_through_image_tower(spark):
    """vec.py:16-22 sends audio bytes through the ``image`` API field, so
    identical content embeds identically as audio and as image — and
    differently as text. The quirk is observable and preserved."""
    df = spark.createDataFrame(
        [("same content", "audio"), ("same content", "image"),
         ("same content", "text"), ("same content", "video")],
        "data string, modality string",
    )
    rows = {r.modality: r.v for r in df.select(
        "modality",
        route_embedding(F.col("data"), F.col("modality")).alias("v"),
    ).collect()}
    assert rows["audio"] == rows["image"]
    assert rows["audio"] != rows["text"]
    # unsupported modality → NULL (toVect returns None, vec.py:24-26)
    assert rows["video"] is None


def test_route_embedding_local_matches_udf_path(spark):
    """Serving embeds single queries on the DRIVER (route_embedding_local)
    and splices the vector in as a literal; the value must be identical to
    what the distributed UDF path produces for every modality route —
    otherwise a served query would rank against a different vector than
    the stored corpus was embedded with."""
    rows = [("the query", "text"), ("the query", "image"),
            ("the query", "audio"), ("the query", "video"), (None, "text")]
    df = spark.createDataFrame(rows, "data string, modality string")
    dist = [r.v for r in df.select(
        route_embedding(F.col("data"), F.col("modality")).alias("v")
    ).collect()]
    local = [route_embedding_local(d, m) for d, m in rows]
    assert dist == local


def test_route_embedding_unit_norm(spark):
    df = spark.createDataFrame([("x", "audio")], "data string, modality string")
    v = df.select(
        route_embedding(F.col("data"), F.col("modality")).alias("v")
    ).first().v
    assert math.isclose(math.fsum(x * x for x in v), 1.0, rel_tol=1e-9)


@pytest.mark.skipif(not _torch_available(),
                    reason="torch/transformers not installed")
def test_clip_udf_constructs_and_normalizes(spark):
    """Production-path invariants (reference app.py:14-15,26): 512-d,
    unit-norm text embeddings. Runs only where the ML stack exists."""
    udf = clip_embed_udf()
    # three strings of different lengths: exercises the batch padding +
    # truncation path, not just a singleton forward pass
    df = spark.createDataFrame(
        [("a cat",), ("a small test sentence",),
         ("a much longer sentence about a red car driving north",)],
        "text string")
    rows = df.select(udf("text").alias("v")).collect()
    assert len(rows) == 3
    for r in rows:
        assert len(r.v) == CLIP_DIM
        assert math.isclose(math.fsum(x * x for x in r.v), 1.0, rel_tol=1e-4)


@pytest.mark.skipif(_torch_available(),
                    reason="gated-path error only fires without torch")
def test_clip_udf_gated_error_is_actionable():
    """In ML-stack-free containers the gate must raise NotImplementedError
    pointing at the stub, not an opaque ImportError mid-query."""
    with pytest.raises(NotImplementedError, match="hash_embed_udf"):
        clip_embed_udf()
