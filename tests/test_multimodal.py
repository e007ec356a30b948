"""t1: binaryFile ingestion + mapInPandas decode plumbing (stub kernel)."""

from __future__ import annotations

import hashlib

import pytest

from multi_model_vectorsearch_spark.sources.multimodal import (
    decode_features,
    read_binary_dir,
)

FAKE_BLOBS = {
    "a.jpg": b"\xff\xd8\xff fake-jpeg-bytes",
    "b.png": b"\x89PNG fake-png-bytes",
    "c.wav": b"RIFF fake-wav-bytes",
    "d.mp4": b"\x00\x00\x00 ftyp fake-video",
    "e.bin": b"opaque",
}


@pytest.fixture(scope="module")
def blob_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blobs")
    for name, data in FAKE_BLOBS.items():
        (d / name).write_bytes(data)
    return str(d)


def test_binary_source_reads_all(spark, blob_dir):
    df = read_binary_dir(spark, blob_dir)
    rows = {r.path.split("/")[-1]: r for r in df.collect()}
    assert set(rows) == set(FAKE_BLOBS)
    assert rows["a.jpg"].modality == "image"
    assert rows["c.wav"].modality == "audio"
    assert rows["d.mp4"].modality == "video"
    assert rows["e.bin"].modality == "binary"
    assert bytes(rows["b.png"].content) == FAKE_BLOBS["b.png"]


def test_glob_filter(spark, blob_dir):
    df = read_binary_dir(spark, blob_dir, glob="*.jpg")
    assert df.count() == 1


def test_decode_features_schema_and_determinism(spark, blob_dir):
    out = decode_features(read_binary_dir(spark, blob_dir))
    rows = {r.path.split("/")[-1]: r for r in out.collect()}
    assert len(rows) == len(FAKE_BLOBS)
    for name, data in FAKE_BLOBS.items():
        r = rows[name]
        assert r.content_sha256 == hashlib.sha256(data).hexdigest()
        assert len(r.feature) == 8
        assert all(-1.0 <= x <= 1.0 for x in r.feature)
        assert r.width >= 16 and r.height >= 16 and r.n_frames >= 1
    # deterministic: run twice, same features
    again = {r.path.split("/")[-1]: r for r in
             decode_features(read_binary_dir(spark, blob_dir)).collect()}
    assert all(rows[n].feature == again[n].feature for n in rows)
