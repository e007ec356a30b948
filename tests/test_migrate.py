"""t1: reference-stack migration — semantic_graph.pkl → edges DataFrame."""

from __future__ import annotations

import os

import pytest

from multi_model_vectorsearch_spark.operators.graph import expand_one_hop
from multi_model_vectorsearch_spark.sources.migrate import (
    import_semantic_graph_pickle,
)

REF_PKL = "/root/reference/semantic_graph.pkl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PKL), reason="reference pickle not present"
)


def test_import_reference_graph(spark):
    """The reference's actual persisted graph (77 nodes / 251 edges,
    SURVEY §2.1) must import losslessly and canonically."""
    edges = import_semantic_graph_pickle(spark, REF_PKL)
    rows = edges.collect()
    assert len(rows) == 251
    nodes = {r.src for r in rows} | {r.dst for r in rows}
    assert len(nodes) == 77
    for r in rows:
        assert r.src < r.dst  # canonicalized like build_edges
        assert r.src.startswith("doc:") and len(r.src) == 4 + 64
        assert isinstance(r.score, float)


def test_imported_graph_round_trips_through_expansion(spark):
    """A seed on the imported graph expands exactly as networkx computes:
    best-path-per-node over 1 hop with the engine's decay."""
    import pickle

    edges = import_semantic_graph_pickle(spark, REF_PKL)
    with open(REF_PKL, "rb") as fh:
        g = pickle.load(fh)
    # pick the highest-degree node as the seed — most interesting hop set
    seed_node = max(g.degree, key=lambda kv: (kv[1], kv[0]))[0]
    seeds = spark.createDataFrame(
        [(seed_node, 1.0)], "vec_id string, s double")
    k = 10
    got = expand_one_hop(seeds, edges, k=k).collect()

    from multi_model_vectorsearch_spark.operators.graph import DECAY as decay

    expected = {seed_node: 1.0}
    for nbr in g.neighbors(seed_node):
        sc = round(1.0 * g.edges[seed_node, nbr]["score"] * decay, 6)
        expected[nbr] = max(expected.get(nbr, float("-inf")), sc)
    want = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert [(r.id, r.score) for r in got] == want


def test_imported_graph_feeds_multi_hop(spark):
    """The imported edges plug into the deeper traversal unchanged: the
    depth-2 expansion returns a full top-k with the seed ranked first."""
    from multi_model_vectorsearch_spark.operators.graph import (
        expand_multi_hop,
    )

    edges = import_semantic_graph_pickle(spark, REF_PKL)
    seed_node = edges.orderBy("src").first().src
    seeds = spark.createDataFrame(
        [(seed_node, 1.0)], "vec_id string, s double")
    got = expand_multi_hop(seeds, edges, depth=2, k=10).collect()
    assert len(got) == 10
    assert got[0].id == seed_node and got[0].score == 1.0
    assert all(got[i].score >= got[i + 1].score for i in range(9))
