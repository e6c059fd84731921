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


# ---------------------------------------------------------------------------
# Bloom-filter frontier seen-set — THE 100 TB crawl membership structure:
# the seen-URL set itself is petabyte-shaped, but its Bloom bitmap is
# m/8 bytes, built with a map-side-combining bit_or aggregate (the
# shuffle carries at most m/32 (word, partial-or) rows per partition)
# and BROADCAST to the probe side. Sized per corpus: m = 2^ceil(log2(
# BITS_PER_KEY * n)), k=4 double hashing h1 + i*h2 from two md5 halves
# — every bit, the bitmap digest, and the FP count replay exactly in
# DuckDB. False negatives are structurally impossible (the query proves
# n_true_pos = n_seen as data); the FP rate is the documented tradeoff.
# ---------------------------------------------------------------------------

_BLOOM_K = 4
_BLOOM_BITS_PER_KEY = 6  # m/n=6, k=4 -> FP ~ (1-e^-0.667)^4 ~ 5%

_URL = "'http://site' || (doc_id % 97) || '.test/page/' || doc_id"
_URL_SPARK = ("concat('http://site', cast(doc_id % 97 as string), "
              "'.test/page/', cast(doc_id as string))")


@register("bloom_seen_urls", sql=f"""
    WITH seen AS (
      SELECT {_URL} AS url FROM documents WHERE doc_id % 2 = 0
    ), params AS (
      SELECT count(*) AS n,
             CAST(pow(2, ceil(log2({_BLOOM_BITS_PER_KEY} * count(*))))
                  AS BIGINT) AS m
      FROM seen
    ), seen_bits AS (
      SELECT (('0x' || substr(md5(url), 1, 8))::UBIGINT
              + i * ('0x' || substr(md5(url), 9, 8))::UBIGINT)
             % (SELECT m FROM params) AS bit
      FROM seen, unnest(range(0, {_BLOOM_K})) AS t(i)
    ), bitmap AS (
      SELECT bit // 32 AS word,
             bit_or(CAST(2 ** (bit % 32) AS BIGINT)) AS w
      FROM seen_bits GROUP BY word
    ), probes AS (
      SELECT doc_id, {_URL} AS url, doc_id % 2 = 0 AS is_seen
      FROM documents
    ), probe_bits AS (
      SELECT doc_id, is_seen,
             (('0x' || substr(md5(url), 1, 8))::UBIGINT
              + i * ('0x' || substr(md5(url), 9, 8))::UBIGINT)
             % (SELECT m FROM params) AS bit
      FROM probes, unnest(range(0, {_BLOOM_K})) AS t(i)
    ), probe_hits AS (
      SELECT doc_id, bool_and(is_seen) AS is_seen,
             CAST(sum(CASE WHEN (coalesce(b.w, 0)
                                 & CAST(2 ** (bit % 32) AS BIGINT)) <> 0
                           THEN 1 ELSE 0 END) AS INT)
               = {_BLOOM_K} AS hit
      FROM probe_bits p LEFT JOIN bitmap b ON p.bit // 32 = b.word
      GROUP BY doc_id
    )
    SELECT (SELECT CAST(n AS INT) FROM params) AS n_seen,
           (SELECT m FROM params) AS m_bits,
           CAST(count(*) AS INT) AS n_probes,
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS INT) AS n_hits,
           CAST(sum(CASE WHEN hit AND is_seen THEN 1 ELSE 0 END) AS INT)
             AS n_true_pos,
           CAST(sum(CASE WHEN hit AND NOT is_seen THEN 1 ELSE 0 END)
                AS INT) AS n_false_pos,
           (SELECT md5(string_agg(word || ':' || w, ',' ORDER BY word))
            FROM bitmap) AS bitmap_md5
    FROM probe_hits
""")
def bloom_seen_urls(spark, sf_dir):
    docs = read_testdata(spark, sf_dir, "documents")
    urls = docs.selectExpr("doc_id", f"{_URL_SPARK} AS url",
                           "doc_id % 2 = 0 AS is_seen")
    params = (urls.filter("is_seen")
              .agg(F.count("*").alias("n"))
              .withColumn("m", F.expr(
                  f"CAST(pow(2, ceil(log2({_BLOOM_BITS_PER_KEY} * n)))"
                  " AS BIGINT)")))
    ks = F.explode(F.array(*[F.lit(i) for i in range(_BLOOM_K)])).alias("i")
    h1 = "CAST(conv(substring(md5(url), 1, 8), 16, 10) AS BIGINT)"
    h2 = "CAST(conv(substring(md5(url), 9, 8), 16, 10) AS BIGINT)"
    bits = (urls.select("doc_id", "is_seen", "url", ks)
            .crossJoin(F.broadcast(params))
            .withColumn("bit", F.expr(f"({h1} + i * {h2}) % m"))
            .withColumn("word", F.expr("bit div 32"))
            .withColumn("mask", F.expr(
                "CAST(pow(2, bit % 32) AS BIGINT)")))
    bitmap = (bits.filter("is_seen")
              .groupBy("word").agg(F.bit_or("mask").alias("w"))
              .localCheckpoint(eager=True))
    # collect_list has no ordering guarantee — build the digest from a
    # sorted single partition (the bitmap is m/32 rows, trivially small)
    digest = (bitmap.orderBy("word").coalesce(1)
              .agg(F.md5(F.concat_ws(",", F.collect_list(
                  F.concat_ws(":", "word", "w")))).alias("bitmap_md5")))
    hits = (bits.join(F.broadcast(bitmap), "word", "left")
            .withColumn("bit_set",
                        (F.coalesce(F.col("w"), F.lit(0))
                         .bitwiseAND(F.col("mask")) != 0).cast("int"))
            .groupBy("doc_id")
            .agg(F.min("is_seen").alias("is_seen"),
                 (F.sum("bit_set") == _BLOOM_K).alias("hit")))
    agg = hits.agg(
        F.count("*").cast("int").alias("n_probes"),
        F.sum(F.col("hit").cast("int")).cast("int").alias("n_hits"),
        F.sum((F.col("hit") & F.col("is_seen")).cast("int")).cast("int")
        .alias("n_true_pos"),
        F.sum((F.col("hit") & ~F.col("is_seen")).cast("int")).cast("int")
        .alias("n_false_pos"))
    return (params.crossJoin(agg).crossJoin(digest)
            .select(F.col("n").cast("int").alias("n_seen"),
                    F.col("m").alias("m_bits"),
                    "n_probes", "n_hits", "n_true_pos", "n_false_pos",
                    "bitmap_md5"))


# ---------------------------------------------------------------------------
# Count-Min sketch over event users — the fixed-memory frequency table
# for 100 TB streams: D x W counters built by ONE map-side-combining
# aggregate (at most D*W (cell, partial-sum) rows cross the wire per
# partition), point estimates = min over D hashed cells. Structural
# guarantee rendered as data: estimates NEVER undercount (n_underest
# must be 0); overcounts are bounded by collisions and reported
# exactly. Every counter, the sketch digest, and each estimate replay
# in DuckDB.
# ---------------------------------------------------------------------------

_CMS_W = 256
_CMS_D = 4


@register("cms_user_counts", sql=f"""
    WITH ev AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events
    ), cells AS (
      SELECT j,
             (('0x' || substr(md5(k), 1, 8))::UBIGINT
              + j * ('0x' || substr(md5(k), 9, 8))::UBIGINT)
             % {_CMS_W} AS col,
             count(*) AS c
      FROM ev, unnest(range(0, {_CMS_D})) AS t(j)
      GROUP BY j, col
    ), truth AS (
      SELECT k, count(*) AS true_c FROM ev GROUP BY k
    ), est AS (
      SELECT t.k, t.true_c, min(c.c) AS est_c
      FROM truth t, unnest(range(0, {_CMS_D})) AS u(j)
      JOIN cells c
        ON c.j = u.j
       AND c.col = (('0x' || substr(md5(t.k), 1, 8))::UBIGINT
                    + u.j * ('0x' || substr(md5(t.k), 9, 8))::UBIGINT)
                   % {_CMS_W}
      GROUP BY t.k, t.true_c
    )
    SELECT CAST({_CMS_W} AS INT) AS width, CAST({_CMS_D} AS INT) AS depth,
           (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_events,
           CAST(count(*) AS INT) AS n_keys,
           CAST(sum(CASE WHEN est_c < true_c THEN 1 ELSE 0 END) AS INT)
             AS n_underest,
           CAST(max(est_c - true_c) AS BIGINT) AS max_overcount,
           CAST(round(avg(est_c - true_c), 4) AS DOUBLE) AS avg_overcount,
           (SELECT md5(string_agg(j || ':' || col || ':' || c, ','
                                  ORDER BY j, col))
            FROM cells) AS sketch_md5
    FROM est
""")
def cms_user_counts(spark, sf_dir):
    ev = (read_testdata(spark, sf_dir, "events")
          .selectExpr("CAST(user_id AS STRING) AS k"))
    ks = F.explode(F.array(*[F.lit(j) for j in range(_CMS_D)])).alias("j")
    h1 = "CAST(conv(substring(md5(k), 1, 8), 16, 10) AS BIGINT)"
    h2 = "CAST(conv(substring(md5(k), 9, 8), 16, 10) AS BIGINT)"
    col_expr = f"({h1} + j * {h2}) % {_CMS_W}"
    cells = (ev.select("k", ks)
             .withColumn("col", F.expr(col_expr))
             .groupBy("j", "col").agg(F.count("*").alias("c"))
             .localCheckpoint(eager=True))
    digest = (cells.orderBy("j", "col").coalesce(1)
              .agg(F.md5(F.concat_ws(",", F.collect_list(
                  F.concat_ws(":", "j", "col", "c"))))
                   .alias("sketch_md5")))
    truth = ev.groupBy("k").agg(F.count("*").alias("true_c"))
    est = (truth.select("k", "true_c", ks)
           .withColumn("col", F.expr(col_expr))
           .join(F.broadcast(cells), ["j", "col"])
           .groupBy("k", "true_c").agg(F.min("c").alias("est_c")))
    n_events = ev.agg(F.count("*").cast("long").alias("n_events"))
    agg = est.agg(
        F.count("*").cast("int").alias("n_keys"),
        F.sum((F.col("est_c") < F.col("true_c")).cast("int")).cast("int")
        .alias("n_underest"),
        F.max(F.col("est_c") - F.col("true_c")).cast("long")
        .alias("max_overcount"),
        F.round(F.avg(F.col("est_c") - F.col("true_c")), 4)
        .alias("avg_overcount"))
    return (n_events.crossJoin(agg).crossJoin(digest)
            .select(F.lit(_CMS_W).cast("int").alias("width"),
                    F.lit(_CMS_D).cast("int").alias("depth"),
                    "n_events", "n_keys", "n_underest", "max_overcount",
                    "avg_overcount", "sketch_md5"))


# ---------------------------------------------------------------------------
# From-scratch HyperLogLog — the COUNT DISTINCT structure at 100 TB
# (approx_distinct_urls_hll uses Spark's built-in HLL++; this one is
# built register by register so DuckDB replays it bit-for-bit and the
# merge algebra is visible). Register build = ONE max-aggregate over
# (bucket, rho): map-side combine ships at most m partial maxima per
# partition; merging shards/sketches is the same max. Everything is
# INTEGER-exact cross-engine: rho comes from length(bin(v)) (no
# float log2 at power-of-two boundaries), and the harmonic sum is the
# exact integer S = sum(2^(VBITS - reg)), so the final estimate is one
# double division with identical operands in both engines.
# ---------------------------------------------------------------------------

_HLL_P = 8                  # m = 256 registers
_HLL_M = 1 << _HLL_P
_HLL_VBITS = 44             # value bits after the bucket prefix
_HLL_ALPHA = 0.7182725932495458  # alpha_256 = 0.7213/(1+1.079/256)


@register("hll_distinct_urls", sql=f"""
    WITH keys AS (
      SELECT DISTINCT {_URL} AS url FROM documents
    ), hashed AS (
      -- 52-bit hash (13 hex chars): top {_HLL_P} bits bucket, low
      -- {_HLL_VBITS} bits value; doubles never touch the integers
      SELECT ('0x' || substr(md5(url), 1, 13))::UBIGINT AS h FROM keys
    ), rho AS (
      SELECT CAST(h >> {_HLL_VBITS} AS BIGINT) AS bucket,
             CAST(h % {1 << _HLL_VBITS} AS BIGINT) AS v
      FROM hashed
    ), regs AS (
      SELECT bucket,
             max(CASE WHEN v = 0 THEN {_HLL_VBITS + 1}
                      ELSE {_HLL_VBITS + 1} - length(bin(v)) END) AS reg
      FROM rho GROUP BY bucket
    ), s AS (
      SELECT CAST(sum(CAST(1 AS BIGINT) << ({_HLL_VBITS} - reg))
                  AS BIGINT) AS s_used,
             CAST(count(*) AS INT) AS m_used
      FROM regs
    ), est AS (
      SELECT m_used,
             {_HLL_M} - m_used AS n_zero_regs,
             -- zero registers contribute 2^VBITS each (reg = 0)
             CAST(s_used + CAST({_HLL_M} - m_used AS BIGINT)
                  * (CAST(1 AS BIGINT) << {_HLL_VBITS}) AS BIGINT)
               AS s_all
      FROM s
    )
    SELECT CAST({_HLL_P} AS INT) AS p, CAST({_HLL_M} AS INT) AS m,
           (SELECT CAST(count(*) AS BIGINT) FROM keys) AS n_exact,
           n_zero_regs, s_all,
           CAST(round(CAST({_HLL_ALPHA} AS DOUBLE) * {_HLL_M} * {_HLL_M}
                      * CAST(CAST(2 AS BIGINT) ** {_HLL_VBITS} AS DOUBLE)
                      / s_all, 2) AS DOUBLE) AS estimate,
           (SELECT md5(string_agg(bucket || ':' || reg, ','
                                  ORDER BY bucket)) FROM regs)
             AS registers_md5,
           abs(CAST({_HLL_ALPHA} AS DOUBLE) * {_HLL_M} * {_HLL_M}
               * CAST(CAST(2 AS BIGINT) ** {_HLL_VBITS} AS DOUBLE) / s_all
               - (SELECT count(*) FROM keys))
             / (SELECT count(*) FROM keys) <= 3 * 1.04 / sqrt({_HLL_M})
             AS within_3sigma
    FROM est
""")
def hll_distinct_urls(spark, sf_dir):
    urls = (read_testdata(spark, sf_dir, "documents")
            .selectExpr(f"{_URL_SPARK} AS url").distinct()
            .localCheckpoint(eager=True))
    hashed = urls.selectExpr(
        "CAST(conv(substring(md5(url), 1, 13), 16, 10) AS BIGINT) AS h")
    rho = hashed.selectExpr(
        f"CAST(h div {1 << _HLL_VBITS} AS BIGINT) AS bucket",
        f"CAST(h % {1 << _HLL_VBITS} AS BIGINT) AS v")
    regs = (rho.selectExpr(
                "bucket",
                f"CASE WHEN v = 0 THEN {_HLL_VBITS + 1} "
                f"ELSE {_HLL_VBITS + 1} - length(bin(v)) END AS rho")
            .groupBy("bucket").agg(F.max("rho").alias("reg"))
            .localCheckpoint(eager=True))
    s = regs.selectExpr(
        f"CAST(shiftleft(CAST(1 AS BIGINT), {_HLL_VBITS} - reg) "
        "AS BIGINT) AS term").agg(
        F.sum("term").cast("long").alias("s_used"),
        F.count("*").cast("int").alias("m_used"))
    digest = (regs.orderBy("bucket").coalesce(1)
              .agg(F.md5(F.concat_ws(",", F.collect_list(
                  F.concat_ws(":", "bucket", "reg"))))
                   .alias("registers_md5")))
    n_exact = urls.agg(F.count("*").cast("long").alias("n_exact"))
    two_v = float(1 << _HLL_VBITS)
    return (s.crossJoin(n_exact).crossJoin(digest)
            .withColumn("n_zero_regs",
                        (F.lit(_HLL_M) - F.col("m_used")).cast("int"))
            .withColumn("s_all",
                        (F.col("s_used")
                         + F.col("n_zero_regs").cast("long")
                         * F.lit(1 << _HLL_VBITS)).cast("long"))
            .withColumn("est_raw",
                        F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * two_v)
                        / F.col("s_all"))
            .select(F.lit(_HLL_P).cast("int").alias("p"),
                    F.lit(_HLL_M).cast("int").alias("m"),
                    "n_exact", "n_zero_regs", "s_all",
                    F.round("est_raw", 2).alias("estimate"),
                    "registers_md5",
                    (F.abs(F.col("est_raw") - F.col("n_exact"))
                     / F.col("n_exact")
                     <= 3 * 1.04 / (_HLL_M ** 0.5))
                    .alias("within_3sigma")))
