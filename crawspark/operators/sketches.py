"""KMV (k-minimum-values) distinct / overlap sketches — the mergeable
sketch path for 100 TB distinct counting and cross-corpus overlap.

The estimator (Bar-Yossef et al., "Counting distinct elements in a data
stream"; the same bottom-k construction behind Apache DataSketches'
theta sketch) keeps only the k smallest distinct hash values of a set.
At cluster scale that is the whole point: each partition forwards at
most k 32-char md5 strings (its local bottom-k), the merge is a bottom-k
of ≤ k·partitions values, and the full-key-space shuffle that an exact
COUNT(DISTINCT) needs never happens. Overlap/Jaccard between two
corpora falls out of the same sketches: the fraction of the UNION's
bottom-k that belongs to both sets is an unbiased Jaccard estimator.

Everything is deterministic and engine-agnostic — md5 is bit-identical
in Spark and DuckDB, and the bottom-k of a set does not depend on
partitioning — so unlike the xxhash64-based minhash structures these
sketch queries are FULLY oracle-checkable: the DuckDB twin recomputes
the identical sketch, estimate, and error bound from the same parquet.

The synthetic "crawl snapshot" URL sets derive from the events table
(url = f(user_id, event_id)); set A and set B are overlapping event
slices, modeling two crawls of the same web.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from crawspark.registry import register
from crawspark.sources import read_testdata

K = 256  # sketch size; KMV standard error ~ 1/sqrt(K-2) ≈ 6.3%
_BOUND = 3.0 / (K - 2) ** 0.5  # 3-sigma relative-error bound (~18.8%)

# Set slices: A = two thirds of events, B = half — urls collide across
# slices (same (user, page) pair from different events), so A∩B is
# strictly larger than the shared-event contribution.
_COND_A = "event_id % 3 != 0"
_COND_B = "event_id % 2 != 0"


def _urls(spark, sf_dir) -> DataFrame:
    ev = read_testdata(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.concat(F.lit("https://s"),
                 (F.col("user_id") % 37).cast("string"),
                 F.lit(".example.com/p/"),
                 (F.col("event_id") % 4000).cast("string")).alias("url"))


def _hashes(urls: DataFrame, cond: str) -> DataFrame:
    return urls.filter(F.expr(cond)).select(F.md5("url").alias("h"))


def _bottom_k(hashes: DataFrame) -> DataFrame:
    """The k smallest DISTINCT hashes, computed scale-style: a TRUE
    local bottom-k per input partition (an Arrow-batched pass that
    never holds more than ~8K distinct strings and emits at most K
    rows), then one bottom-k merge of ≤ K·partitions strings. Only K
    values per partition ever cross the shuffle — the full-key-space
    exchange an exact COUNT(DISTINCT) needs never happens. (A
    groupBy(spark_partition_id).agg(slice(collect_set...)) formulation
    does NOT have this property: the slice runs after the aggregate,
    so the whole per-partition distinct set crosses the wire — r5
    review finding.)"""
    def local_bottom_k(batches):
        seen: set = set()
        for pdf in batches:
            seen.update(pdf["h"])
            if len(seen) > 8 * K:  # keep the candidate pool bounded
                seen = set(sorted(seen)[:K])
        yield pd.DataFrame({"h": sorted(seen)[:K]})

    per_part = hashes.mapInPandas(local_bottom_k, "h string")
    return per_part.agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, K).alias("sketch"))


def _estimate(sketch_col):
    """(K-1) / frac(h_K): the KMV distinct estimator. frac maps the
    k-th smallest hash to (0,1) via its leading 32 bits — md5 hex sorts
    lexicographically = numerically, and an 8-hex-digit prefix is exact
    in a double, so Spark and DuckDB produce the identical float."""
    kth = F.try_element_at(sketch_col, F.lit(K))
    frac = F.conv(F.substring(kth, 1, 8), 16, 10).cast("double") / 4294967296.0
    return F.when(F.size(sketch_col) >= K, (K - 1) / frac).otherwise(
        F.size(sketch_col).cast("double"))


_FRAC_SQL = "(('0x' || substr(sk.sketch[{k}], 1, 8))::UBIGINT / 4294967296.0)"


@register("sketch_kmv_distinct", sql=f"""
    WITH urls AS (
      SELECT event_id,
             'https://s' || (user_id % 37) || '.example.com/p/'
               || (event_id % 4000) AS url
      FROM events
    ), sets AS (
      SELECT 'A' AS set_name, md5(url) AS h FROM urls
      WHERE {_COND_A}
      UNION ALL
      SELECT 'B', md5(url) FROM urls WHERE {_COND_B}
    ), sk AS (
      SELECT set_name, list_sort(list(DISTINCT h))[1:{K}] AS sketch,
             COUNT(DISTINCT h) AS exact_distinct
      FROM sets GROUP BY set_name
    )
    SELECT set_name, CAST({K} AS INT) AS k,
           ROUND(CASE WHEN len(sk.sketch) >= {K}
                 THEN ({K} - 1) / {_FRAC_SQL.format(k=K)}
                 ELSE CAST(len(sk.sketch) AS DOUBLE) END, 4) AS est_distinct,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           CASE WHEN len(sk.sketch) >= {K} THEN
             ABS(({K} - 1) / {_FRAC_SQL.format(k=K)} - exact_distinct)
               / exact_distinct <= {_BOUND}
           ELSE TRUE END AS within_bound
    FROM sk
""")
def sketch_kmv_distinct(spark, sf_dir):
    # Distinct-URL estimate per crawl snapshot from a 256-value sketch,
    # with the exact count and the 3-sigma bound check as DATA — the
    # driver hash pins the estimator's arithmetic AND its accuracy
    # contract on this corpus. Shuffle: ≤ K hashes per partition.
    urls = _urls(spark, sf_dir)
    out = []
    for name, cond in (("A", _COND_A), ("B", _COND_B)):
        hashes = _hashes(urls, cond)
        sk = _bottom_k(hashes).withColumn("est", _estimate(F.col("sketch")))
        exact = hashes.select(
            F.countDistinct("h").alias("exact_distinct"))
        out.append(
            sk.crossJoin(exact).select(
                F.lit(name).alias("set_name"),
                F.lit(K).cast("int").alias("k"),
                F.round("est", 4).alias("est_distinct"),
                F.col("exact_distinct").cast("long"),
                (F.abs(F.col("est") - F.col("exact_distinct"))
                 / F.col("exact_distinct") <= _BOUND).alias("within_bound")))
    return out[0].unionAll(out[1])


@register("sketch_kmv_overlap", sql=f"""
    WITH urls AS (
      SELECT event_id,
             'https://s' || (user_id % 37) || '.example.com/p/'
               || (event_id % 4000) AS url
      FROM events
    ), ha AS (
      SELECT DISTINCT md5(url) AS h FROM urls WHERE {_COND_A}
    ), hb AS (
      SELECT DISTINCT md5(url) AS h FROM urls WHERE {_COND_B}
    ), uni AS (
      SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
      ORDER BY h LIMIT {K}
    ), marked AS (
      SELECT uni.h,
             (uni.h IN (SELECT h FROM ha)
              AND uni.h IN (SELECT h FROM hb)) AS in_both
      FROM uni
    ), agg AS (
      SELECT COUNT(*) AS k_used,
             SUM(CASE WHEN in_both THEN 1 ELSE 0 END) AS n_both
      FROM marked
    ), exact AS (
      SELECT (SELECT COUNT(*) FROM ha JOIN hb USING (h)) AS n_inter,
             (SELECT COUNT(*) FROM
               (SELECT h FROM ha UNION SELECT h FROM hb)) AS n_union
    )
    SELECT CAST(k_used AS INT) AS k_used,
           CAST(n_both AS INT) AS n_both,
           ROUND(CAST(n_both AS DOUBLE) / k_used, 4) AS jaccard_est,
           ROUND(CAST(n_inter AS DOUBLE) / n_union, 4) AS jaccard_exact,
           ABS(CAST(n_both AS DOUBLE) / k_used
               - CAST(n_inter AS DOUBLE) / n_union) <= {_BOUND}
             AS within_bound
    FROM agg, exact
""")
def sketch_kmv_overlap(spark, sf_dir):
    # Jaccard between two crawl snapshots from the union's bottom-k:
    # the fraction of the union sketch present in BOTH sets estimates
    # J(A,B). Membership of the K sketch hashes is resolved with
    # broadcast semi-joins (K rows vs each set — one scan per side, no
    # big shuffle); the exact Jaccard rides along as the QA contract.
    urls = _urls(spark, sf_dir)
    ha = _hashes(urls, _COND_A).distinct()
    hb = _hashes(urls, _COND_B).distinct()
    uni = (_bottom_k(ha.unionAll(hb))
           .select(F.explode("sketch").alias("h")))
    # membership via broadcast semi-joins of the K sketch hashes
    both = (ha.join(F.broadcast(uni), ["h"], "left_semi")
            .join(F.broadcast(hb.join(F.broadcast(uni), ["h"],
                                      "left_semi")), ["h"], "left_semi"))
    counts = uni.agg(F.count("*").alias("k_used")).crossJoin(
        both.agg(F.count("*").alias("n_both")))
    exact = (ha.join(hb, ["h"], "left_semi")
             .agg(F.count("*").alias("n_inter"))
             .crossJoin(ha.unionAll(hb).distinct()
                        .agg(F.count("*").alias("n_union"))))
    return counts.crossJoin(exact).select(
        F.col("k_used").cast("int"),
        F.col("n_both").cast("int"),
        F.round(F.col("n_both") / F.col("k_used"), 4).alias("jaccard_est"),
        F.round(F.col("n_inter") / F.col("n_union"), 4)
        .alias("jaccard_exact"),
        (F.abs(F.col("n_both") / F.col("k_used")
               - F.col("n_inter") / F.col("n_union")) <= _BOUND)
        .alias("within_bound"))
