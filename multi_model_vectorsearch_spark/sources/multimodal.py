"""Multimodal binary columns: ingestion + decode/feature plumbing.

The reference stores image/audio blobs in an ``uploads/`` directory keyed by
content hash (main.py:62-68) and embeds them through CLIP (app.py:31-40). The
Spark-native shape:

- ingest with the ``binaryFile`` source → ``(path, modificationTime, length,
  content BINARY)``, plus typed metadata columns derived declaratively;
- decode / feature-extract / resize / frame-sample as ``mapInPandas`` stages
  over Arrow batches, partition-parallel.

Media codecs are not available in this container, so the decode kernels are
deterministic fakes clearly marked as stubs: they exercise the real Spark
plumbing (schemas, batch iteration, binary columns, partitioning) and are
swapped for PIL/ffmpeg kernels by changing one function body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "path string, content_sha256 string, modality string, "
    "width int, height int, n_frames int, feature array<double>"
)


def read_binary_dir(spark: SparkSession, path: str,
                    glob: str | None = None) -> DataFrame:
    """Ingest a blob directory via the binaryFile source (B3).

    Modality is inferred from the extension — the reference trusts the form
    field (main.py:49-57); a pipeline at scale trusts bytes/extension.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    modality = (
        F.when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
        .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
        .otherwise("binary")
    )
    return df.withColumn("modality", modality)


def _fake_decode(content: bytes) -> tuple[int, int, int, list[float]]:
    """STUB decode kernel — deterministic fake standing in for PIL/ffmpeg.

    Real implementation would decode pixels/samples; container lacks codecs.
    Emits plausible metadata + an 8-d feature derived from content bytes so
    downstream operators (KNN, dedup) are exercised end-to-end.
    """
    h = hashlib.sha256(content).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    n_frames = 1 + h[2] % 8
    feature = [b / 255.0 * 2 - 1 for b in h[3:11]]
    return width, height, n_frames, feature


def decode_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract binary blobs via mapInPandas (Arrow batches).

    Plumbing is production-shaped: batch iterator, binary column in, typed
    struct out; only ``_fake_decode``'s body is a stub.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "path": [], "content_sha256": [], "modality": [],
                "width": [], "height": [], "n_frames": [], "feature": [],
            }
            for path, modality, content in zip(
                pdf["path"], pdf["modality"], pdf["content"]
            ):
                blob = bytes(content)
                w, hgt, nf, feat = _fake_decode(blob)
                out["path"].append(path)
                out["content_sha256"].append(hashlib.sha256(blob).hexdigest())
                out["modality"].append(modality)
                out["width"].append(w)
                out["height"].append(hgt)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = (
    "path string, modality string, width int, height int, resized binary"
)
FRAME_SCHEMA = "path string, frame_idx int, frame_sha256 string"


def resize_images(df: DataFrame, target: int = 32) -> DataFrame:
    """Resize stage over binary image columns via mapInPandas (B3 pipeline).

    STUB kernel: real code calls PIL's ``resize``; here the "resized" bytes
    are a deterministic digest-stretch of the source so downstream schema,
    batching, and partitioning behavior are exercised for real. Swap the
    body for PIL and the plan is production-ready.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "modality": [], "width": [], "height": [],
                   "resized": []}
            for path, modality, content in zip(
                pdf["path"], pdf["modality"], pdf["content"]
            ):
                blob = bytes(content)
                fake = (hashlib.sha256(blob).digest()
                        * (target * target * 3 // 32 + 1))[: target * target * 3]
                out["path"].append(path)
                out["modality"].append(modality)
                out["width"].append(target)
                out["height"].append(target)
                out["resized"].append(fake)
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_nth: int = 2,
                  max_frames: int = 4) -> DataFrame:
    """Frame-sampling stage for video blobs: 1 row in → ≤max_frames out.

    STUB kernel standing in for ffmpeg keyframe extraction; frame count is
    derived deterministically from the content digest (same rule as
    ``_fake_decode``), so the fan-out shape — the part Spark cares about —
    is real.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "frame_idx": [], "frame_sha256": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                h = hashlib.sha256(blob)
                n = 1 + h.digest()[2] % 8
                for idx in range(0, min(n, max_frames * every_nth), every_nth):
                    fh = hashlib.sha256(blob + idx.to_bytes(4, "big"))
                    out["path"].append(path)
                    out["frame_idx"].append(idx)
                    out["frame_sha256"].append(fh.hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=FRAME_SCHEMA)
