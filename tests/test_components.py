"""connected_components: the driver union-find fast path and the
distributed min-label loop must agree exactly (hand-computed graph with a
chain, a triangle-with-tail merge, and singleton-free isolation)."""

from __future__ import annotations

from crawspark.operators.dedup import connected_components

# components: {1,2,3,4} (chain via 1-2, 2-3, 3-4), {10,11,12,13}
# (triangle 10-11-12 + tail 13), {20,21}
EDGES = [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (12, 13),
         (20, 21)]
EXPECTED = {1: 1, 2: 1, 3: 1, 4: 1,
            10: 10, 11: 10, 12: 10, 13: 10,
            20: 20, 21: 20}


def _run(spark, max_driver_edges):
    edges = spark.createDataFrame(EDGES, "doc_a long, doc_b long")
    got = connected_components(edges, max_driver_edges=max_driver_edges)
    return {r["node"]: r["label"] for r in got.collect()}


def test_driver_union_find_path(spark):
    assert _run(spark, max_driver_edges=10_000) == EXPECTED


def test_distributed_propagation_path(spark):
    assert _run(spark, max_driver_edges=0) == EXPECTED


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(edges).count() == 0
    assert connected_components(edges, max_driver_edges=0).count() == 0
