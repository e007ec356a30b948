"""Lineage pinning with a cluster-fault-tolerance switch (r8 verdict item 2).

Iterative chains (graph expansion, connected components, PageRank, k-core,
BFS) and multi-pass plans (``global_order_scalable``'s two-pass range
partitioning, the ingest pipeline's per-batch reuse points) cut lineage
with ``localCheckpoint`` — blocks live in executor MEMORY (spilling to
executor-local disk) and are NOT fault-tolerant: on a real cluster,
losing one executor discards its blocks, and because the lineage was
truncated Spark cannot recompute them — the job fails. That is fine on
``local[32]`` (one JVM; if it dies the whole app is gone anyway) but the
wrong default for a 1000-executor 100 TB run.

``pin``/``pin_lazy`` are the one chokepoint every such site routes
through, applied postfix via ``DataFrame.transform`` so call sites keep
their chained shape::

    frontier = expand(frontier).transform(pin)        # eager
    labels = step(labels).transform(pin_lazy)          # lazy

By default they ``localCheckpoint``. When the session conf
``spark.mmvs.checkpoint.mode=reliable`` is set — use
:func:`enable_reliable_checkpoints`, which also sets the SparkContext
checkpoint directory (HDFS/S3 on a cluster) — they use
``DataFrame.checkpoint``: blocks are written to the reliable store and
survive executor loss. Outputs are identical in both modes
(``tests/test_checkpoint_mode.py`` pins the flagship iterative entries);
the trade is one distributed-fs write per pinned table.

No site is exempted from the switch: driver- and domain-bounded pinned
tables (centroid sets, per-range offset inputs) also route through
``pin`` — their reliable write is a few KB, and one auditable switch
beats a site-by-site exemption list (SURVEY.md §7 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MODE_CONF = "spark.mmvs.checkpoint.mode"


def _mode(df: DataFrame) -> str:
    try:
        return df.sparkSession.conf.get(MODE_CONF, "local")
    except Exception:
        return "local"


def pin(df: DataFrame) -> DataFrame:
    """Eager lineage cut: materialize now, truncate the plan."""
    if _mode(df) == "reliable":
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def pin_lazy(df: DataFrame) -> DataFrame:
    """Lazy lineage cut: truncate the plan, materialize on first use."""
    if _mode(df) == "reliable":
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)


def enable_reliable_checkpoints(spark: SparkSession,
                                checkpoint_dir: str) -> None:
    """Switch every ``pin`` site in the engine to reliable checkpoints
    rooted at ``checkpoint_dir`` (an HDFS/S3 path on a real cluster)."""
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    spark.conf.set(MODE_CONF, "reliable")


def disable_reliable_checkpoints(spark: SparkSession) -> None:
    """Return ``pin`` sites to executor-memory localCheckpoint."""
    spark.conf.set(MODE_CONF, "local")
