"""Scale-mechanism evidence tests (SURVEY.md §4.3): bucketed co-located
joins skip the shuffle entirely, and AQE splits skewed join partitions at
runtime. These pin the mechanisms the 100 TB design names — on a real
cluster the same configs/table layouts do the work."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawspark.plans import executed_plan


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("feature"))
    scores = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13).cast("double").alias("score"))
    for name, df in (("b_docs", docs), ("b_scores", scores)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # external table (explicit path): bucket metadata lives in the
        # session catalog, data under tmp_path
        (df.write.bucketBy(8, "doc_id").sortBy("doc_id")
         .option("path", str(tmp_path / name))
         .mode("overwrite").saveAsTable(name))
    yield "b_docs", "b_scores"
    for name in ("b_docs", "b_scores"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # Both sides bucketed by the join key into the same bucket count →
    # the sort-merge join reads buckets co-located, ZERO Exchange in the
    # plan. This is the pre-shuffled layout the design prescribes for the
    # doc_id joins (results ⋈ metadata) at 10^12 rows.
    a, b = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(a).join(spark.table(b), "doc_id")
        plan = executed_plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 2000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    # One key owns ~95% of the left side. With AQE skew-join enabled and
    # thresholds scaled to testdata, the runtime plan marks the sort-merge
    # join `skew=true` and splits the hot partition — the mechanism that
    # replaces hand-salting when the skew is only discovered at runtime
    # (hand salting stays for the aggregation path: join_salted_skew).
    left_path = str(tmp_path / "skew_left")
    right_path = str(tmp_path / "skew_right")
    (spark.range(0, 200_000)
     .select(F.when(F.col("id") % 20 != 0, 7).otherwise(F.col("id") % 1000)
             .alias("k"),
             F.col("id").alias("v"))
     .write.mode("overwrite").parquet(left_path))
    (spark.range(0, 1000).select(F.col("id").alias("k"),
                                 (F.col("id") * 2).alias("w"))
     .write.mode("overwrite").parquet(right_path))
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = (spark.read.parquet(left_path)
                  .join(spark.read.parquet(right_path), "k"))
        # collect() on THIS Dataset so its own QueryExecution finalizes —
        # count() would plan a different (aggregated) query.
        n = len(joined.collect())
        assert n == 200_000
        plan = executed_plan(joined)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
