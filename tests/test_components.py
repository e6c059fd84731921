"""connected_components: the driver union-find fast path and the
distributed large-star/small-star loop must agree exactly (hand-computed
graph with a chain, a triangle-with-tail merge, and singleton-free
isolation), and the star loop must converge in O(log n) rounds on a deep
chain — the property plain min-label propagation lacks."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from crawspark.operators.dedup import _star_components, connected_components

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


def test_star_converges_logarithmically_on_deep_chain(spark):
    # 64-node chain (diameter 63): min-label propagation needs ~63 rounds;
    # large-star/small-star must finish in O(log n) — assert a hard cap
    # well under the diameter, and exact labels.
    n = 64
    chain = [(i, i + 1) for i in range(n - 1)]
    canon = (spark.createDataFrame(chain, "doc_a long, doc_b long")
             .select(F.greatest("doc_a", "doc_b").alias("src"),
                     F.least("doc_a", "doc_b").alias("dst")))
    labels, rounds = _star_components(canon)
    assert rounds <= 10, f"star took {rounds} rounds on a 64-chain"
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_self_loop_nodes_labeled_on_both_paths(spark):
    # (a, a) self-loops: the canonical edge set drops them, but the node
    # must still get a (node, node) label row on BOTH paths (r3 review
    # finding — output must not depend on the max_driver_edges side).
    edges = spark.createDataFrame([(5, 5), (1, 2)], "doc_a long, doc_b long")
    want = {1: 1, 2: 1, 5: 5}
    for cap in (10_000, 0):
        got = {r["node"]: r["label"] for r in
               connected_components(edges, max_driver_edges=cap).collect()}
        assert got == want, f"cap={cap}"


def test_star_random_graphs_match_union_find(spark):
    # Differential vs the driver union-find on random sparse graphs.
    rng = random.Random(7)
    for trial in range(3):
        nodes = list(range(60))
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(45)]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        exact = {r["node"]: r["label"] for r in
                 connected_components(df, max_driver_edges=10_000).collect()}
        star = {r["node"]: r["label"] for r in
                connected_components(df, max_driver_edges=0).collect()}
        assert star == exact, f"trial {trial}"


def test_pagerank_hosts_properties(spark):
    # Structural sanity at sf0.001: a probability distribution — ranks
    # positive and summing to ~1.0 (r5: dangling mass redistributed
    # uniformly per iteration, textbook PageRank; r4 leaked it), and
    # linked hosts outrank the no-in-link sources.
    from crawspark.registry import load_all

    reg = load_all()
    rows = reg["pagerank_hosts"].spark(
        spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 10
    ranks = {r["node"]: r["rank"] for r in rows}
    assert all(v > 0 for v in ranks.values())
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    floor = (1 - 0.85) / len(ranks)
    # sources receive no in-links → all sit at the same baseline (floor +
    # damped dangling share), strictly above the bare floor; linked hosts
    # rise above that baseline.
    srcs = [v for k, v in ranks.items() if k.startswith("src")]
    hosts = [v for k, v in ranks.items() if not k.startswith("src")]
    assert srcs and hosts
    assert max(srcs) - min(srcs) < 1e-12
    assert min(srcs) >= floor - 1e-12
    assert max(hosts) > max(srcs) * 1.5


def test_heavy_hitters_superset_survives_thin_spread(spark):
    # Adversarial: the heavy hitter is spread EVENLY across partitions
    # (never locally dominant) among high-cardinality noise — the MG(k)
    # union must still contain it (pigeonhole: global freq > n/k implies
    # partition freq > n_p/k somewhere), and the exact pass must emit
    # exactly the brute-force answer.
    from pyspark.sql import functions as F

    from crawspark.operators.analytics import heavy_hitters

    # 90k unique noise keys + 10k copies of key 42; k=12 → threshold
    # n/k = 8333 < 10000 (global ratio 0.1 > 1/13, so MG(12) must keep it
    # in its best partition even though 625 copies never dominate any
    # 6250-row partition locally)
    noise = spark.range(100, 90_100).select(F.col("id").alias("k"))
    hot = spark.range(10_000).select(F.lit(42).cast("long").alias("k"))
    df = noise.unionByName(hot).repartition(16)  # hot rows scatter evenly
    got = heavy_hitters(df, "k", 12).collect()
    assert [(r["k"], r["freq"]) for r in got] == [(42, 10_000)]


def test_hits_scores_are_l1_normalized(spark):
    # Kleinberg's invariants after the final iteration: authority mass
    # and hub mass each sum to 1 (L1), authorities live only on link
    # TARGETS and hubs only on link SOURCES.
    import pytest

    from crawspark.operators.analytics import hits_hosts

    rows = hits_hosts(spark, "/root/testdata/sf0.001").collect()
    asum = sum(r["authority"] for r in rows)
    hsum = sum(r["hub"] for r in rows)
    assert asum == pytest.approx(1.0, abs=1e-9)
    assert hsum == pytest.approx(1.0, abs=1e-9)
    assert any(r["authority"] > 0 and r["hub"] == 0 for r in rows) or \
        any(r["hub"] > 0 and r["authority"] == 0 for r in rows)
    # scores differentiate (not a uniform fixed point)
    assert len({round(r["authority"], 9) for r in rows}) > 3


def test_label_propagation_refines_connected_components(spark):
    # LPA invariants at sf0.001: every host labeled exactly once, labels
    # are node ids, >1 community exists (the algorithm discriminates),
    # and every community lies inside ONE connected component of the
    # undirected host graph (LPA can only refine reachability, never
    # merge across components).
    from crawspark.operators.analytics import _host_edges
    from crawspark.registry import load_all

    sf = "/root/testdata/sf0.001"
    reg = load_all()
    rows = reg["communities_label_propagation"].spark(spark, sf).collect()
    community = {r["node"]: r["community"] for r in rows}
    assert len(rows) == len(community)  # one row per node

    edges, nodes = _host_edges(spark, sf)
    node_set = {r["node"] for r in nodes.collect()}
    assert set(community) == node_set
    assert set(community.values()) <= node_set

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edges.collect():
        a, b = find(e["src"]), find(e["dst"])
        if a != b:
            parent[a] = b
    comp_of = {n: find(n) for n in node_set}
    for node, lbl in community.items():
        assert comp_of[node] == comp_of[lbl], (node, lbl)
    assert len(set(community.values())) > 1


def test_personalized_pagerank_mass_and_locality(spark):
    # PPR invariants at sf0.001: mass is conserved (teleport AND dangling
    # return to the seed set, so ranks sum to 1), rank is non-negative,
    # and a node carries rank iff it is a seed or reachable from one —
    # unreachable non-seeds are EXACTLY zero (no uniform teleport floor,
    # unlike pagerank_hosts).
    from crawspark.operators.analytics import _host_edges
    from crawspark.registry import load_all

    sf = "/root/testdata/sf0.001"
    reg = load_all()
    rows = reg["pagerank_personalized"].spark(spark, sf).collect()
    rank = {r["node"]: r["rank"] for r in rows}
    assert abs(sum(rank.values()) - 1.0) < 1e-9
    assert all(v >= 0 for v in rank.values())

    edges, _nodes = _host_edges(spark, sf)
    adj: dict = {}
    for e in edges.collect():
        adj.setdefault(e["src"], []).append(e["dst"])
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    seeds = {r["source"] for r in docs.select("source").distinct().collect()}
    seeds &= set(rank)
    # within-PR_ITERS-hops reach MUST carry rank; rank implies reachable
    # at all (a node 6+ hops out is legitimately still zero after 5
    # iterations, so the two directions use different horizons)
    from crawspark.operators.analytics import PR_ITERS
    reach_k = set(seeds)
    frontier = list(seeds)
    for _ in range(PR_ITERS):
        nxt = [d for s in frontier for d in adj.get(s, ())
               if d not in reach_k]
        reach_k.update(nxt)
        frontier = nxt
    reach_all = set(reach_k)
    while frontier:
        nxt = [d for s in frontier for d in adj.get(s, ())
               if d not in reach_all]
        reach_all.update(nxt)
        frontier = nxt
    for node, v in rank.items():
        if node in reach_k:
            assert v > 0, node
        if v > 0:
            assert node in reach_all, node
