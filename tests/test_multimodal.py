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


def test_resize_and_frame_sample_stages(spark, tmp_path):
    """Resize keeps 1:1 rows; frame sampling fans out ≤max_frames per blob."""
    from multi_model_vectorsearch_spark.sources.multimodal import (
        read_binary_dir,
        resize_images,
        sample_frames,
    )

    d = tmp_path / "blobs"
    d.mkdir()
    for i in range(5):
        (d / f"clip{i}.mp4").write_bytes(bytes([i]) * (50 + i))
    df = read_binary_dir(spark, str(d))
    rs = resize_images(df, target=8).collect()
    assert len(rs) == 5
    assert all(r.width == 8 and r.height == 8 and len(r.resized) == 8 * 8 * 3
               for r in rs)
    fr = sample_frames(df, every_nth=2, max_frames=4).collect()
    assert 5 <= len(fr) <= 5 * 4
    per = {}
    for r in fr:
        per.setdefault(r.path, []).append(r.frame_idx)
    assert all(idxs == sorted(idxs) and len(set(idxs)) == len(idxs)
               for idxs in per.values())
    # determinism: same bytes -> same frame hashes
    fr2 = sample_frames(df, every_nth=2, max_frames=4).collect()
    assert sorted(map(tuple, fr)) == sorted(map(tuple, fr2))


def test_schema_evolution_merge_read(spark, tmp_path):
    """mergeSchema read unifies parquet files written with evolving schemas."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, txt string") \
        .write.mode("append").parquet(d)
    spark.createDataFrame([(2, "b", 0.5)], "id bigint, txt string, score double") \
        .write.mode("append").parquet(d)
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"id", "txt", "score"}
    rows = {r.id: (r.txt, r.score) for r in merged.collect()}
    assert rows[1] == ("a", None) and rows[2] == ("b", 0.5)


def test_csv_and_json_sources_roundtrip(spark, tmp_path):
    """B1 extension: CSV and JSON line sources read back with explicit
    schemas (schema inference is a scan tax at 100 TB — always declare)."""
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id bigint, name string, score double"
    )
    df.write.mode("overwrite").option("header", True).csv(csv_dir)
    df.write.mode("overwrite").json(json_dir)
    back_csv = spark.read.schema(df.schema).option("header", True).csv(csv_dir)
    back_json = spark.read.schema(df.schema).json(json_dir)
    want = sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, back_csv.collect())) == want
    assert sorted(map(tuple, back_json.collect())) == want
