"""Reliable-checkpoint mode (r8 verdict item 2).

Every iterative/multi-pass lineage cut in the engine routes through
``checkpointing.pin``/``pin_lazy``. By default that is ``localCheckpoint``
(executor-memory blocks — correct on local[32], unrecoverable on executor
loss at cluster scale); with ``spark.mmvs.checkpoint.mode=reliable`` it is
``DataFrame.checkpoint`` into a reliable store. This suite pins that the
flagship iterative entries produce IDENTICAL output in both modes and that
reliable mode actually writes checkpoint data.
"""

from __future__ import annotations

import os

import pytest

from multi_model_vectorsearch_spark.checkpointing import (
    disable_reliable_checkpoints,
    enable_reliable_checkpoints,
    pin,
)
from multi_model_vectorsearch_spark.testing import canon_rows


def _run_flagships(tables):
    from multi_model_vectorsearch_spark.operators.ann import dq122_kmeans_lloyd
    from multi_model_vectorsearch_spark.operators.graph import (
        dq55_expand_2hop,
        dq72_pagerank,
        dq121_bfs_layers,
        dq190_kcore,
    )
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq61_dedup_clusters,
    )

    out = {}
    for name, fn in [("dq55", dq55_expand_2hop), ("dq61", dq61_dedup_clusters),
                     ("dq72", dq72_pagerank), ("dq121", dq121_bfs_layers),
                     ("dq122", dq122_kmeans_lloyd), ("dq190", dq190_kcore)]:
        df = fn(tables)
        out[name] = canon_rows(df.columns, [tuple(r) for r in df.collect()])
    return out


def test_reliable_mode_outputs_identical_and_writes_store(
        spark, tables, tmp_path):
    local = _run_flagships(tables)
    ckdir = str(tmp_path / "reliable_ck")
    enable_reliable_checkpoints(spark, ckdir)
    try:
        assert spark.conf.get("spark.mmvs.checkpoint.mode") == "reliable"
        reliable = _run_flagships(tables)
    finally:
        disable_reliable_checkpoints(spark)
    for name in local:
        assert reliable[name] == local[name], \
            f"{name}: reliable-checkpoint output differs from local mode"
    # the mode really took effect: the reliable store received RDD data
    written = [
        os.path.join(r, f) for r, _d, fs in os.walk(ckdir) for f in fs
    ]
    assert written, "reliable mode must write to the checkpoint directory"


def test_pin_mode_switch_unit(spark, tmp_path):
    """pin() uses executor-memory blocks by default and the reliable store
    when the session conf is set; both forms cut lineage (the pinned plan
    has no parquet/scan ancestry to recompute from)."""
    df = spark.range(100).selectExpr("id", "id * 2 as y")
    out = pin(df)
    assert out.count() == 100
    enable_reliable_checkpoints(spark, str(tmp_path / "ck"))
    try:
        out_r = pin(df)
        assert out_r.count() == 100
        assert sorted(map(tuple, out_r.collect())) == \
            sorted(map(tuple, out.collect()))
        written = [f for _r, _d, fs in os.walk(str(tmp_path / "ck"))
                   for f in fs]
        assert written, "checkpoint() must write into the reliable store"
    finally:
        disable_reliable_checkpoints(spark)


def test_ingest_pipeline_under_both_modes(spark, tables, tmp_path):
    """The streaming ingest's per-batch lineage cuts also route through
    pin(): state produced under reliable mode equals local mode."""
    from pyspark.sql import functions as F

    from multi_model_vectorsearch_spark.streaming.ingest import IngestPipeline

    docs = tables["documents"].limit(30).select(
        "doc_id", "text",
        F.element_at(
            F.array(F.lit("text"), F.lit("image"), F.lit("audio")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
    )

    def run(state):
        pipe = IngestPipeline(spark, str(tmp_path / state), k=4)
        pipe.process_batch(docs, 0)
        return (
            sorted((r.doc_id, r.content_sha256)
                   for r in pipe.corpus().collect()),
            sorted((r.src, r.dst, round(r.score, 6))
                   for r in pipe.edges().collect()),
        )

    local = run("st_local")
    enable_reliable_checkpoints(spark, str(tmp_path / "ck"))
    try:
        reliable = run("st_reliable")
    finally:
        disable_reliable_checkpoints(spark)
    assert reliable == local
