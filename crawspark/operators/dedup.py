"""Deduplication suite for a training-data pipeline: exact, n-gram Jaccard,
MinHash+LSH, SimHash. Everything JVM-side (built-in array/hash functions) —
no Python UDFs; at 100 TB dedup is shuffle-dominated, so each variant keeps
its shuffle keyed on a small derived column (hash/band/bucket), never on
raw text."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from crawspark.registry import register
from crawspark.sources import read_testdata

# Shared tokenization: must match the DuckDB oracle exactly.
_TOKS = "filter(split(lower(text), '[^a-z]+'), x -> x != '')"
# Shingles from a pre-computed `toks` column — embedding _TOKS directly
# re-evaluates the split+filter once per reference (no CSE across
# higher-order functions; measured 2x on the dedup queries).
_SHINGLES = ("array_distinct(transform(sequence(1, size(toks) - 2), "
             "i -> concat_ws(' ', slice(toks, i, 3))))")


@register("dedup_exact", sql="""
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents GROUP BY content_hash
""")
def dedup_exact(spark, sf_dir):
    # Exact dedup: hash-groupBy on md5(text) — the shuffle key is 32 bytes
    # regardless of document size; min(doc_id) is the canonical keeper.
    return (read_testdata(spark, sf_dir, "documents")
            .groupBy(F.md5("text").alias("content_hash"))
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").alias("n_copies")))


@register("dedup_ngram_jaccard", sql="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                         x -> x <> '') AS toks
      FROM documents WHERE doc_id < 300
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(toks) - 1),
               i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS shingle
      FROM tok WHERE len(toks) >= 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), overlap AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           CAST(round(CAST(n_common AS DOUBLE)
                      / (sa.n_sh + sb.n_sh - n_common), 4) AS DOUBLE) AS jaccard
    FROM overlap
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.05
""")
def dedup_ngram_jaccard(spark, sf_dir):
    # Word-3-gram Jaccard near-dup: explode distinct shingles, self-join on
    # the shingle (the classic inverted-index pair generation — shuffle key
    # is the shingle, so only docs sharing a shingle ever meet).
    docs = (read_testdata(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 300)
            .repartition(spark.sparkContext.defaultParallelism)
            .withColumn("toks", F.expr(_TOKS))
            .filter(F.size("toks") >= 3)
            .withColumn("shingles", F.expr(_SHINGLES))
            .select("doc_id", "shingles"))
    # sh feeds three plan branches (sizes, both join sides) — cache it so
    # the shingle construction runs once, not three times.
    sh = (docs.select("doc_id", F.explode("shingles").alias("shingle"))
          .cache())
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    overlap = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                      & (F.col("a.doc_id") < F.col("b.doc_id")))
               .groupBy(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b"))
               .agg(F.count("*").alias("n_common")))
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (F.col("n_common").cast("double")
           / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")))
    return (overlap
            .join(sa, F.col("doc_a") == F.col("sa.doc_id"))
            .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
            .filter(jac >= 0.05)
            .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard")))


# ---------------------------------------------------------------------------
# MinHash + LSH (rows-only: Spark-hash-specific, not oracle-expressible)
# ---------------------------------------------------------------------------

N_HASHES = 16
BANDS = 4  # 4 rows per band


def minhash_signatures(df: DataFrame) -> DataFrame:
    """doc_id → 16 minhash values, computed as min(xxhash64(seed_i||shingle))
    per seed — pure JVM aggregates after one explode.

    The input is repartitioned first: a small single-file parquet scan
    yields ONE partition, serializing the (CPU-heavy) shingle HOFs onto
    one core (measured 12s → <1s at sf0.1)."""
    sc = df.sparkSession.sparkContext
    df = df.repartition(sc.defaultParallelism)
    # No array_distinct: min() over a multiset equals min() over its set,
    # so duplicate shingles cannot change a minhash (the O(n^2)
    # interpreted distinct was the dominant cost). The shingle string is
    # hashed ONCE; the 16 hash functions re-hash that 8-byte value
    # (xxhash64(h, i)) — long hashing in codegen instead of 16 string
    # hashes (ANSI-safe: no overflowing arithmetic).
    sh = (df.withColumn("toks", F.expr(_TOKS))
          .filter(F.size("toks") >= 3)
          .withColumn(
              "sh_raw",
              F.expr("transform(sequence(1, size(toks) - 2), "
                     "i -> concat_ws(' ', slice(toks, i, 3)))"))
          .select("doc_id", F.explode("sh_raw").alias("shingle"))
          .withColumn("h", F.xxhash64("shingle")))
    aggs = [F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"mh{i}")
            for i in range(N_HASHES)]
    return sh.groupBy("doc_id").agg(*aggs)


@register("dedup_minhash_lsh")  # rows-only check
def dedup_minhash_lsh(spark, sf_dir):
    # Band the signature (4 bands x 4 rows): docs agreeing on any full band
    # hash become candidate pairs — the scale path for near-dup at 100 TB
    # (candidate generation shuffles only (band_id, band_hash) keys).
    docs = read_testdata(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    rows_per_band = N_HASHES // BANDS
    # One pass: band hashes as columns, then a single stack() explode —
    # a per-band union would recompute the signature aggregation B times.
    band_cols = [F.xxhash64(*[F.col(f"mh{b * rows_per_band + r}")
                              for r in range(rows_per_band)]).alias(f"bh{b}")
                 for b in range(BANDS)]
    wide = sig.select("doc_id", *band_cols)
    stack_expr = "stack({}, {}) as (band_id, band_hash)".format(
        BANDS, ", ".join(f"{b}, bh{b}" for b in range(BANDS)))
    # cache: both sides of the candidate self-join read this — without it
    # the whole shingle+minhash pipeline runs twice.
    exploded = wide.select("doc_id", F.expr(stack_expr)).cache()
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                    & (F.col("a.band_hash") == F.col("b.band_hash"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    return pairs.agg(F.count("*").alias("n_candidate_pairs"),
                     F.coalesce(F.min("doc_a"), F.lit(-1)).alias("min_doc_a"))


@register("dedup_simhash")  # rows-only check
def dedup_simhash(spark, sf_dir):
    # 32-bit SimHash from token hashes, all JVM-side: per-bit sign sums via
    # 32 conditional aggregates, then Hamming-bucket grouping on the
    # fingerprint's top half (cheap blocking key).
    docs = read_testdata(spark, sf_dir, "documents")
    tok = (docs.withColumn("toks", F.expr(_TOKS))
           .select("doc_id", F.explode("toks").alias("tok"))
           .withColumn("h", F.xxhash64("tok")))
    bit_aggs = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                     1).otherwise(-1)).alias(f"b{i}")
        for i in range(32)
    ]
    sums = tok.groupBy("doc_id").agg(*bit_aggs)
    fp = F.lit(0).cast("long")
    for i in range(32):
        fp = fp + F.when(F.col(f"b{i}") > 0,
                         F.lit(2 ** i).cast("long")).otherwise(F.lit(0))
    sig = sums.select("doc_id", fp.alias("simhash"))
    blocks = (sig.withColumn("block", F.shiftright(F.col("simhash"), 16))
              .groupBy("block").agg(F.count("*").alias("n_docs")))
    return blocks.agg(F.count("*").alias("n_blocks"),
                      F.max("n_docs").alias("max_block_size"))
