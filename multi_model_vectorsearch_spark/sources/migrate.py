"""Migration utilities for users moving off the reference stack.

The reference persists its semantic graph by whole-graph pickle
(main.py:27-37: ``pickle.load(open('semantic_graph.pkl'))`` of a
``networkx.Graph`` whose nodes are ``doc:<sha256>`` keys and whose edges
carry a ``score`` float, written by main.py:275-276). A user switching to
this engine wants that graph carried over into the ``edges`` DataFrame the
expansion operators consume.

A pickled in-process graph is by construction a single-machine object, so
the import is a driver-side read — this is a one-time migration utility,
not a scale path. Once imported, the graph lives in Parquet and all
maintenance is incremental (streaming/ingest.build_edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def import_semantic_graph_pickle(spark: SparkSession, path: str) -> DataFrame:
    """Load the reference's ``semantic_graph.pkl`` into a canonical edges
    DataFrame ``(src string, dst string, score double)``.

    Edges are canonicalized exactly like the engine's own
    ``IngestPipeline.build_edges`` (src < dst, max score per pair), so the
    imported graph round-trips through ``expand_one_hop`` / the dq34
    family unchanged.

    Only unpickle files you trust: ``pickle.load`` executes arbitrary
    reduction callables, and the file must have been written by a process
    with ``networkx`` importable (it is required here for the same
    reason).
    """
    import pickle

    try:
        import networkx  # noqa: F401 — needed to unpickle the Graph
    except ImportError as exc:  # pragma: no cover - env without networkx
        raise NotImplementedError(
            "importing a pickled networkx graph requires networkx"
        ) from exc

    with open(path, "rb") as fh:
        g = pickle.load(fh)
    rows = [
        (u, v, float(data.get("score", 0.0))) if u <= v
        else (v, u, float(data.get("score", 0.0)))
        for u, v, data in g.edges(data=True)
    ]
    df = spark.createDataFrame(rows, "src string, dst string, score double")
    # undirected networkx graphs yield each edge once, but canonicalize
    # defensively the same way build_edges does (max score per pair)
    return df.groupBy("src", "dst").agg(F.max("score").alias("score"))
