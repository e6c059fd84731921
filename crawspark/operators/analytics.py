"""Large-scale analytics operators over the events/embeddings tables:
gap-based sessionization, exact interpolated percentiles, and embedding
vector ops (normalize + int8 quantization accounting). All JVM built-ins,
all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crawspark.registry import register
from crawspark.sources import read_testdata

SESSION_GAP_MIN = 30


@register("sessionize_events", sql=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER w <= INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 0 ELSE 1 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tagged AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS INT) AS session_id,
           count(*) AS n_events,
           CAST(round(sum(value), 2) AS DOUBLE) AS session_value,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
             AS duration_sec
    FROM tagged GROUP BY user_id, session_id
""")
def sessionize_events(spark, sf_dir):
    # Gap-based sessionization: a new session starts when the gap from the
    # previous event exceeds SESSION_GAP_MIN. One shuffle on user_id (the
    # window), then a running sum of session-start flags — the standard
    # scalable shape (no self-join, no UDF). lag(ts) is NULL on the first
    # event → flagged as a session start on both engines.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")  # NTZ -> epoch secs (session tz = UTC)
    gap_ok = sec - F.lag(sec).over(w) <= SESSION_GAP_MIN * 60
    # tie-break on event_id in BOTH windows — with ties ordered by ts
    # alone, session assignment at a duplicate timestamp would be
    # partition-order-dependent (nondeterministic vs the oracle).
    wrun = (Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (read_testdata(spark, sf_dir, "events")
            .withColumn("new_session",
                        F.when(gap_ok, 0).otherwise(1))
            .withColumn("session_id",
                        F.sum("new_session").over(wrun).cast("int"))
            .groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("session_value"),
                 (F.max(F.unix_timestamp("ts"))
                  - F.min(F.unix_timestamp("ts")))
                 .alias("duration_sec")))


@register("quantile_doc_sizes", sql="""
    SELECT lang,
           CAST(round(quantile_cont(n_chars, 0.5), 2) AS DOUBLE)  AS p50,
           CAST(round(quantile_cont(n_chars, 0.9), 2) AS DOUBLE)  AS p90,
           CAST(round(quantile_cont(n_chars, 0.99), 2) AS DOUBLE) AS p99,
           max(n_chars) AS max_chars
    FROM documents GROUP BY lang
""")
def quantile_doc_sizes(spark, sf_dir):
    # Exact interpolated percentiles of the document-size distribution —
    # the heavy-tail evidence behind the salted/size-bucketed batching
    # story. Spark percentile() and DuckDB quantile_cont share linear
    # interpolation semantics; at true scale swap approx_percentile
    # (t-digest) in the same position.
    return (read_testdata(spark, sf_dir, "documents")
            .groupBy("lang")
            .agg(F.round(F.percentile("n_chars", F.lit(0.5)), 2).alias("p50"),
                 F.round(F.percentile("n_chars", F.lit(0.9)), 2).alias("p90"),
                 F.round(F.percentile("n_chars", F.lit(0.99)), 2).alias("p99"),
                 F.max("n_chars").alias("max_chars")))


@register("embedding_quantize_stats", sql="""
    SELECT label,
           count(*) AS n_vectors,
           CAST(round(avg(scale), 6) AS DOUBLE) AS avg_scale,
           CAST(round(max(max_err), 6) AS DOUBLE) AS worst_abs_err
    FROM (
      SELECT label,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127
               AS scale,
             list_max(list_transform(embedding::DOUBLE[], x ->
               abs(x - round(x / (list_max(list_transform(
                 embedding::DOUBLE[], y -> abs(y))) / 127))
                 * (list_max(list_transform(embedding::DOUBLE[],
                    y -> abs(y))) / 127)))) AS max_err
      FROM embeddings
    ) GROUP BY label
""")
def embedding_quantize_stats(spark, sf_dir):
    # Symmetric int8 quantization accounting: per-vector scale =
    # max|x|/127, worst reconstruction error after round-trip. The
    # quantized representation is what ships to ANN serving at scale
    # (4x smaller vectors); this query verifies the error bound is
    # scale/2 and is fully SQL-reproducible (round half-even on both
    # engines for the value path).
    emb = read_testdata(spark, sf_dir, "embeddings")
    dbl = "transform(embedding, x -> cast(x as double))"
    scale = f"array_max(transform({dbl}, x -> abs(x))) / 127"
    max_err = (f"array_max(transform({dbl}, x -> "
               f"abs(x - round(x / ({scale})) * ({scale}))))")
    return (emb.select("label", F.expr(scale).alias("scale"),
                       F.expr(max_err).alias("max_err"))
            .groupBy("label")
            .agg(F.count("*").alias("n_vectors"),
                 F.round(F.avg("scale"), 6).alias("avg_scale"),
                 F.round(F.max("max_err"), 6).alias("worst_abs_err")))


@register("zorder_events", sql="""
    -- closed-form Morton interleave of (user_id % 256, hour-of-month
    -- bucket % 256): bit i of x at position 2i, of y at 2i+1
    SELECT event_id,
           CAST((SELECT sum(
               (((user_id % 256) // (1 << i.i)) % 2) * (1 << (2 * i.i))
             + (((CAST(floor(date_part('epoch', ts
                       - TIMESTAMP '2024-01-01') / 3600) AS BIGINT) % 256)
                 // (1 << i.i)) % 2) * (1 << (2 * i.i + 1))
           ) FROM (SELECT unnest(range(8)) AS i) i) AS BIGINT) AS zval
    FROM events
""")
def zorder_events(spark, sf_dir):
    # Z-order layout key for the events table: user stripe x hour-of-month
    # bucket, both folded to 8 bits. Per-event z-values are hash-checked
    # against the SQL interleave; the clustering PROPERTY (narrow per-file
    # min/max in both dimensions after repartitionByRange+sort) is pinned
    # in tests/test_scale_plans.py.
    from crawspark.operators.partitioning import zvalue_expr

    ev = read_testdata(spark, sf_dir, "events")
    x = (F.col("user_id") % 256).cast("long")
    y = (F.floor((F.unix_timestamp("ts")
                  - F.unix_timestamp(F.lit("2024-01-01").cast("timestamp")))
                 / 3600) % 256).cast("long")
    return ev.select("event_id", zvalue_expr(x, y).cast("long").alias("zval"))
