"""Embedding inference surface (SURVEY.md B56, reference A1-A2).

The reference embeds via an HTTP microservice (vec.py:29-37 → Flask app.py:
22-40 running CLIP ViT-B/16, L2-normalized 512-d float32). The Spark-native
replacement is a scalar-iterator pandas UDF: the model loads once per Python
worker (the iterator pattern amortizes it, like the Flask process did), rows
arrive as Arrow batches, and the UDF returns ``array<double>`` columns — the
HTTP hop becomes an in-plan exchange.

Two backends:

- ``hash_embed_udf`` — a deterministic stand-in model (sha256-driven pseudo
  embeddings, L2-normalized). It exercises the *entire* Spark surface
  (Arrow batching, iterator lifecycle, array columns, downstream KNN) and is
  reproducible in SQL, so even the UDF path is oracle-checkable.
- ``clip_embed_udf`` — the production CLIP path, gated behind an import-try
  (torch/transformers are not in this container). Same signature, same
  downstream plan.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType

HASH_DIM = 16
CLIP_DIM = 512  # reference: main.py:25, app.py:10


def hash_embed_text(text: str, dim: int = HASH_DIM) -> list[float]:
    """Deterministic pseudo-embedding: dim sha256-derived draws in [-1, 1),
    unit norm. Each digest yields eight independent 32-bit lanes (8 hex
    chars each), so a 16-dim vector costs 2 digests instead of 16 — the
    hashing is the whole 'model', so this is the stub's inference cost."""
    vals = []
    for d in range((dim + 7) // 8):
        h = hashlib.sha256(f"{text}:{d}".encode()).hexdigest()
        for j in range(min(8, dim - d * 8)):
            vals.append(int(h[j * 8:j * 8 + 8], 16) / 2.0**32 * 2.0 - 1.0)
    norm = math.sqrt(math.fsum(v * v for v in vals))
    return [v / norm for v in vals]


# DataType instance (not DDL string): decorating at import time must not
# require an active SparkSession.
@pandas_udf(ArrayType(DoubleType()))
def hash_embed_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Scalar-iterator pandas UDF over text (stand-in model load goes here)."""
    # model initialization would happen once, here, before the loop
    for series in batches:
        yield series.map(lambda s: hash_embed_text(s if s is not None else ""))


@pandas_udf(ArrayType(DoubleType()))
def hash_embed_media_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Deterministic stand-in for the *image* encoder (reference app.py's
    CLIP image tower). Salted differently from the text encoder so the two
    towers are distinguishable in tests, like the real model's are."""
    for series in batches:
        yield series.map(
            lambda s: hash_embed_text(f"media:{s if s is not None else ''}"))


def route_embedding(data, modality):
    """The reference's modality router (vec.py:10-27) as one expression.

    * ``text`` → text encoder;
    * ``image`` **and** ``audio`` → the image encoder — vec.py:16-22 base64s
      audio bytes into the ``image`` API field ("If you later add audio
      embedding, adjust here"), so audio observably embeds through the image
      tower. That pass-through quirk is part of the reference's behavior and
      is preserved here;
    * anything else → NULL (toVect returns None, vec.py:24-26); callers drop
      the row exactly as the reference aborts the submit.
    """
    from pyspark.sql import functions as F

    return (
        F.when(modality == "text", hash_embed_udf(data))
        .when(modality.isin("image", "audio"), hash_embed_media_udf(data))
        .otherwise(F.lit(None).cast(ArrayType(DoubleType())))
    )


def route_embedding_local(text: str | None, modality: str) -> list[float] | None:
    """Driver-side twin of :func:`route_embedding` for SINGLE-query serving.

    A one-row query does not need a Spark job + Arrow round-trip just to
    embed itself: this calls the exact same kernel the UDFs map over
    (``hash_embed_text``; the media tower's ``media:`` salt included), so
    the returned vector is value-identical to what the distributed path
    produces — serving paths can splice it in as a literal. Same modality
    routing as vec.py:10-27, including audio-through-image and the
    NULL-on-unknown contract.
    """
    if modality == "text":
        return hash_embed_text(text if text is not None else "")
    if modality in ("image", "audio"):
        return hash_embed_text(f"media:{text if text is not None else ''}")
    return None


def clip_embed_udf():
    """Production CLIP text/image embedder (same plan shape as the stub).

    Returns a pandas UDF if torch+transformers are importable; raises
    NotImplementedError in minimal containers. The model is loaded once per
    worker inside the iterator (reference keeps it resident in the Flask
    process, app.py:9-11).
    """
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without ML stack
        raise NotImplementedError(
            "CLIP backend needs torch+transformers; use hash_embed_udf for "
            "plumbing tests"
        ) from exc

    @pandas_udf(ArrayType(DoubleType()))
    def _clip(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:  # pragma: no cover
        from transformers import CLIPModel, CLIPProcessor

        model = CLIPModel.from_pretrained("openai/clip-vit-base-patch16")
        proc = CLIPProcessor.from_pretrained("openai/clip-vit-base-patch16")
        model.eval()
        for series in batches:
            import torch

            with torch.no_grad():
                inputs = proc(text=series.tolist(), return_tensors="pt",
                              padding=True, truncation=True)
                feats = model.get_text_features(**inputs)
                feats = torch.nn.functional.normalize(feats, p=2, dim=-1)
            yield pd.Series(list(feats.numpy().astype(float)))

    return _clip
