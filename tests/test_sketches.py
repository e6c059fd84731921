"""KMV sketch properties: the bottom-k of a set must not depend on how
the input is partitioned (that is what makes it mergeable at cluster
scale), the estimator must hit its error bound, and the overlap query's
membership joins must be broadcast (no big shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawspark.operators.sketches import (
    _bottom_k,
    _estimate,
    K,
    sketch_kmv_overlap,
)

SF = "/root/testdata/sf0.001"


def test_bottom_k_partition_invariant(spark):
    hashes = (spark.range(5000)
              .select(F.md5(F.col("id").cast("string")).alias("h")))
    a = _bottom_k(hashes.repartition(3)).first()["sketch"]
    b = _bottom_k(hashes.repartition(17)).first()["sketch"]
    c = _bottom_k(hashes.coalesce(1)).first()["sketch"]
    assert a == b == c
    assert len(a) == K and a == sorted(a)


def test_bottom_k_dedups_before_ranking(spark):
    # 600 distinct values, each duplicated 5x: the sketch must rank
    # DISTINCT hashes (duplicates collapsing), so the estimate tracks
    # 600, not 3000.
    hashes = (spark.range(3000)
              .select(F.md5((F.col("id") % 600).cast("string")).alias("h")))
    sk = _bottom_k(hashes).withColumn("est", _estimate(F.col("sketch")))
    row = sk.first()
    assert len(set(row["sketch"])) == K
    assert abs(row["est"] - 600) / 600 < 3.0 / (K - 2) ** 0.5


def test_small_set_returns_exact_size(spark):
    # fewer distinct values than K: the estimator falls back to the
    # sketch size, which IS the exact distinct count
    hashes = (spark.range(1000)
              .select(F.md5((F.col("id") % 50).cast("string")).alias("h")))
    sk = _bottom_k(hashes).withColumn("est", _estimate(F.col("sketch")))
    row = sk.first()
    assert len(row["sketch"]) == 50 and row["est"] == 50.0


def test_overlap_membership_joins_are_broadcast(spark):
    df = sketch_kmv_overlap(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    # every membership resolution must be broadcast, not shuffled
    assert plan.count("BroadcastHashJoin") >= 2
    row = df.first()
    assert row["within_bound"] is True
    assert 0.0 <= row["jaccard_est"] <= 1.0
