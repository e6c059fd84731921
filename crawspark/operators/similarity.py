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
    # Embedding near-dup: all-pairs cosine >= 0.35 as a BLOCK-PAIR GRID —
    # vectors hash into B blocks, the B*(B+1)/2 block pairs become one task
    # each, and every task matmuls its two blocks with numpy. Nothing is
    # ever gathered to the driver (the r1 design broadcast the full corpus
    # matrix from the driver — a driver OOM at 100x scale); the per-task
    # working set is 2 blocks = O(N/B * dim), so B scales with the corpus
    # while tasks stay memory-bounded. A row-pair theta-join with per-pair
    # array expressions is ~50x slower (measured: 35s vs <1s at 2k
    # vectors). The pruned alternative at extreme scale is
    # ann_lsh_buckets (bucketed joins skip far pairs entirely).
    import math

    import numpy as np
    import pandas as pd

    emb = read_testdata(spark, sf_dir, "embeddings")
    # Block count scales with the corpus so per-task working sets stay
    # bounded (~TARGET_BLOCK vectors x dim doubles per side); the count()
    # is parquet-footer metadata, not a scan.
    TARGET_BLOCK = 4096
    n_blocks = max(8, math.ceil(emb.count() / TARGET_BLOCK))
    blocks = (emb.select("vec_id", "embedding",
                         F.pmod(F.col("vec_id"), F.lit(n_blocks))
                         .alias("blk"))
              .groupBy("blk")
              .agg(F.collect_list(F.struct("vec_id", "embedding"))
                   .alias("vecs")))
    ba = blocks.select(F.col("blk").alias("blk_a"),
                       F.col("vecs").alias("vecs_a"))
    bb = blocks.select(F.col("blk").alias("blk_b"),
                       F.col("vecs").alias("vecs_b"))
    grid = (ba.join(bb, F.col("blk_a") <= F.col("blk_b"))
            .repartition(n_blocks * (n_blocks + 1) // 2, "blk_a", "blk_b"))

    def _mat(cell):
        ids = np.array([v["vec_id"] for v in cell], dtype=np.int64)
        m = np.array([np.asarray(v["embedding"], dtype=np.float64)
                      for v in cell])
        return ids, m, np.sqrt((m * m).sum(axis=1))

    def block_pair(batches):
        for pdf in batches:
            for blk_a, blk_b, vecs_a, vecs_b in zip(
                    pdf["blk_a"], pdf["blk_b"], pdf["vecs_a"], pdf["vecs_b"]):
                a_ids, a_mat, a_n = _mat(vecs_a)
                b_ids, b_mat, b_n = _mat(vecs_b)
                sims = (a_mat @ b_mat.T) / np.outer(a_n, b_n)
                # Each unordered pair {i, j} occurs in exactly one block
                # pair. Same block: keep the upper triangle (a < b). Cross
                # block: every matrix cell is a distinct pair — normalize
                # orientation to (min_id, max_id).
                if blk_a == blk_b:
                    mask = a_ids[:, None] < b_ids[None, :]
                else:
                    mask = a_ids[:, None] != b_ids[None, :]
                lo = np.minimum(a_ids[:, None], b_ids[None, :])
                hi = np.maximum(a_ids[:, None], b_ids[None, :])
                ai, bj = np.nonzero(mask & (sims >= 0.35))
                # Known low-probability parity flake (ADVICE r2): numpy
                # matmul accumulates pairwise/SIMD and np.round is
                # half-even, while the DuckDB oracle's
                # list_cosine_similarity accumulates sequentially and
                # round() is half-away-from-zero — a sim within ~1 ulp of
                # the 4-dp boundary or the 0.35 threshold can diverge.
                # Accepted as-is: testdata embeddings are int-valued mock
                # vectors whose sims sit far from boundaries; revisit with
                # the _DOT pinned-order treatment if it ever fires.
                yield pd.DataFrame({"vec_a": lo[ai, bj], "vec_b": hi[ai, bj],
                                    "cos_sim": np.round(sims[ai, bj], 4)})

    return grid.mapInPandas(block_pair,
                            "vec_a long, vec_b long, cos_sim double")


@register("dedup_embedding_resolve", sql="""
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 4) >= 0.4
    ), edges AS (
      SELECT va AS src, vb AS dst FROM pairs
      UNION ALL SELECT vb, va FROM pairs
    ), reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS vec_id, min(label) AS keep_id FROM reach GROUP BY node
""")
def dedup_embedding_resolve(spark, sf_dir):
    # Embedding-cosine near-dup RESOLVED to keepers: the block-grid pair
    # scan (no driver gather, no all-pairs shuffle of raw vectors) feeds
    # the same hybrid connected-components as the minhash resolve —
    # semantic duplicate CLUSTERS collapse to min-vec_id keepers, not
    # just a pair list. Threshold 0.4 on the 4dp-rounded cosine (66/59
    # edges at sf0.001/sf0.01 — real clusters to resolve), mirrored in
    # the oracle's recursive-CTE replay. At 100 TB the pair scan is the
    # pruned ann_lsh_buckets path feeding the same component loop.
    from crawspark.operators.dedup import connected_components

    pairs = (embedding_cosine_pairs(spark, sf_dir)
             .filter(F.col("cos_sim") >= 0.4)
             .select(F.col("vec_a").alias("doc_a"),
                     F.col("vec_b").alias("doc_b")))
    comp = connected_components(pairs)
    return comp.select(F.col("node").alias("vec_id"),
                       F.col("label").alias("keep_id"))


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
    from crawspark.operators.partitioning import ensure_parallelism

    emb = read_testdata(spark, sf_dir, "embeddings").withColumn(
        "norm", F.expr(f"sqrt({_DOT.format(a='embedding', b='embedding')})"))
    q = emb.filter(F.col("vec_id") < 5).alias("q")
    # r6: the corpus side computes every per-pair dot product after the
    # broadcast join — on the embeddings table's ONE row group that all
    # ran on one core (see ensure_parallelism).
    n = ensure_parallelism(emb).alias("n")
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
    # joins query buckets (+multi-probe neighbors) instead of the full
    # corpus. Emits the bucket-size histogram (a banding bug that empties
    # or collapses buckets shifts these rows, unlike a single aggregate).
    emb = read_testdata(spark, sf_dir, "embeddings")
    sig = emb.select("vec_id", _lsh_signature("embedding").alias("bucket"))
    sizes = sig.groupBy("bucket").agg(F.count("*").alias("n_vectors"))
    return (sizes.groupBy("n_vectors").agg(F.count("*").alias("n_buckets"))
            .orderBy("n_vectors"))


# Product quantization (PQ): split the 64-dim vector into M subspaces of
# SUB_D dims; each subvector quantizes to one of PQ_K codes per subspace
# → an M-byte code per vector (8 bytes vs 256 — the compression that
# makes billion-vector ANN serving fit in RAM; asymmetric-distance
# search sums per-subspace lookup tables). Codebooks here are the
# first-PQ_K corpus vectors' subvectors (the same deterministic seeding
# convention as the IVF cent0) so the ENTIRE assignment is
# SQL-replayable; the production path trains per-subspace k-means
# exactly like _centroids does per cell.
PQ_M, PQ_SUB_D, PQ_K = 8, 8, 16

# Shared CTE fragments for the PQ oracles: the codebook and the
# per-(vector, subspace) code assignment (round-6 squared L2, ties to
# the lowest code) — ONE builder feeding embedding_pq_codes and
# ann_search_pq so the two queries can never drift apart.
_PQ_SLICE = (f"list_slice({{v}}::DOUBLE[], {{s}} * {PQ_SUB_D} + 1, "
             f"{{s}} * {PQ_SUB_D} + {PQ_SUB_D})")


def _pq_d2(vec_expr: str, sub: str = "c.sub") -> str:
    sl = _PQ_SLICE.format(v=vec_expr, s=sub)
    return (f"round(list_sum(list_transform(range(1, {PQ_SUB_D} + 1), "
            f"i -> ({sl}[i] - c.cvec[i]) * ({sl}[i] - c.cvec[i]))), 6)")


def _pq_base_ctes() -> str:
    return f"""cb AS (
      SELECT e.vec_id AS code, s.s AS sub,
             {_PQ_SLICE.format(v='e.embedding', s='s.s')} AS cvec
      FROM embeddings e, (SELECT unnest(range({PQ_M})) AS s) s
      WHERE e.vec_id < {PQ_K}
    ), dist AS (
      SELECT e.vec_id, c.sub, c.code,
             {_pq_d2('e.embedding')} AS d2
      FROM embeddings e CROSS JOIN cb c
    ), assign AS (
      SELECT vec_id, sub, code, d2 FROM (
        SELECT vec_id, sub, code, d2,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d2, code) AS rn
        FROM dist) WHERE rn = 1
    )"""


@register("embedding_pq_codes", sql=f"""
    WITH {_pq_base_ctes()}
    SELECT CAST(sub AS INT) AS sub, CAST(code AS INT) AS code,
           count(*) AS n_vectors,
           CAST(round(avg(d2), 3) AS DOUBLE) AS mean_d2
    FROM assign GROUP BY sub, code
""")
def embedding_pq_codes(spark, sf_dir):
    # Per-(subspace, code) occupancy histogram + mean squared
    # quantization error. One corpus scan: the PQ_K x M codebook rides
    # as a broadcast numpy array, each Arrow batch computes all M
    # argmins vectorized; the only shuffle is the (sub, code) aggregate
    # (<= M*PQ_K groups). Distances round to 6dp before argmin (ties ->
    # lowest code) so the DuckDB replay picks identical codes; mean_d2
    # averages the ROUNDED distances, keeping accumulation-order noise
    # orders of magnitude below the 3dp output rounding.
    import numpy as np
    import pandas as pd

    emb = read_testdata(spark, sf_dir, "embeddings")
    seed = (emb.filter(F.col("vec_id") < PQ_K)
            .select("vec_id", "embedding").toPandas()
            .sort_values("vec_id"))
    C = np.array(list(seed["embedding"]), dtype=np.float64)  # PQ_K x 64
    bc = spark.sparkContext.broadcast(C)

    def assign(batches):
        cb = bc.value.reshape(PQ_K, PQ_M, PQ_SUB_D)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf["embedding"]),
                         dtype=np.float64).reshape(-1, PQ_M, PQ_SUB_D)
            out_sub, out_code, out_d2 = [], [], []
            for s in range(PQ_M):
                # (n, PQ_K) squared L2 in subspace s
                diff = V[:, None, s, :] - cb[None, :, s, :]
                d2 = np.round((diff * diff).sum(axis=2), 6)
                codes = np.argmin(d2, axis=1)  # first min = lowest code
                out_sub.append(np.full(len(V), s, dtype="int32"))
                out_code.append(codes.astype("int32"))
                out_d2.append(d2[np.arange(len(V)), codes])
            yield pd.DataFrame({
                "sub": np.concatenate(out_sub),
                "code": np.concatenate(out_code),
                "d2": np.concatenate(out_d2),
            })

    assigned = (emb.select("embedding")
                .mapInPandas(assign, "sub int, code int, d2 double"))
    return (assigned.groupBy("sub", "code")
            .agg(F.count("*").alias("n_vectors"),
                 F.round(F.avg("d2"), 3).alias("mean_d2")))


@register("ann_search_pq", sql=f"""
    WITH {_pq_base_ctes()},
    qlut AS (
      -- per-query lookup table: exact squared distance from the query's
      -- subvector to EVERY code's centroid
      SELECT q.vec_id AS query_id, c.sub, c.code,
             {_pq_d2('q.embedding')} AS qd2
      FROM embeddings q CROSS JOIN cb c WHERE q.vec_id < 5
    ), adc AS (
      -- asymmetric distance: sum the M table entries selected by the
      -- corpus vector's codes (round-6 like every cross-engine sum)
      SELECT l.query_id, a.vec_id AS neighbor_id,
             round(sum(l.qd2), 6) AS approx_d2
      FROM assign a
      JOIN qlut l ON l.sub = a.sub AND l.code = a.code
      WHERE a.vec_id <> l.query_id
      GROUP BY l.query_id, a.vec_id
    )
    SELECT query_id, neighbor_id,
           CAST(approx_d2 AS DOUBLE) AS approx_d2,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT query_id, neighbor_id, approx_d2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_d2, neighbor_id) AS rank
      FROM adc) WHERE rank <= 5
""")
def ann_search_pq(spark, sf_dir):
    # ADC (asymmetric distance computation) search over PQ codes: each
    # query precomputes an M x PQ_K lookup table of exact
    # query-subvector-to-centroid distances (tiny, driver-side — K query
    # rows by definition); a corpus vector's approximate distance is the
    # sum of the M entries its codes select. The corpus side touches
    # only the M-byte codes — at 10^12 vectors that is the entire point:
    # the scan reads 8 bytes/vector instead of 256, and the shuffle is
    # the per-query top-k. Codebook, codes, tables and ranking all
    # replay in DuckDB (deterministic first-K codebook).
    import numpy as np
    import pandas as pd

    emb = read_testdata(spark, sf_dir, "embeddings")
    seed = (emb.filter(F.col("vec_id") < PQ_K)
            .select("vec_id", "embedding").toPandas()
            .sort_values("vec_id"))
    C = np.array(list(seed["embedding"]),
                 dtype=np.float64).reshape(PQ_K, PQ_M, PQ_SUB_D)
    qrows = (emb.filter(F.col("vec_id") < 5)
             .select("vec_id", "embedding").collect())
    # M x PQ_K LUT per query, exact distances, round-6 to match the SQL
    luts = {}
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64).reshape(
            PQ_M, PQ_SUB_D)
        diff = qv[None, :, :] - C  # (K, M, D)
        luts[int(r["vec_id"])] = np.round(
            (diff * diff).sum(axis=2).T, 6)  # (M, K)
    bc_c = spark.sparkContext.broadcast(C)
    bc_l = spark.sparkContext.broadcast(luts)

    def score(batches):
        cb = bc_c.value
        lut = bc_l.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf["embedding"]),
                         dtype=np.float64).reshape(-1, PQ_M, PQ_SUB_D)
            ids = pdf["vec_id"].to_numpy()
            codes = np.empty((len(V), PQ_M), dtype=np.int64)
            for s in range(PQ_M):
                diff = V[:, None, s, :] - cb[None, :, s, :]
                d2 = np.round((diff * diff).sum(axis=2), 6)
                codes[:, s] = np.argmin(d2, axis=1)
            out = []
            for qid, tbl in lut.items():
                approx = np.round(
                    tbl[np.arange(PQ_M)[None, :], codes].sum(axis=1), 6)
                keep = ids != qid
                out.append(pd.DataFrame({
                    "query_id": qid, "neighbor_id": ids[keep],
                    "approx_d2": approx[keep]}))
            yield pd.concat(out)

    scored = (emb.select("vec_id", "embedding")
              .mapInPandas(score,
                           "query_id long, neighbor_id long, "
                           "approx_d2 double"))
    w = (Window.partitionBy("query_id")
         .orderBy("approx_d2", "neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 5))


N_CELLS = 16
KMEANS_ITERS = 5
_DIM = 64  # embeddings table dim (TESTDATA; FIXTURES.md §3)
_CODEBOOK_CACHE: dict[tuple[str, str], object] = {}


def _kmeans_round(spark, data, C):
    """One spherical k-means iteration, Spark-native.

    Workers reduce their batches into K*dim partial sums (numpy add.at —
    the big reduction happens executor-side); the driver exact-sums
    (math.fsum) at most parts*K*dim partial rows — bounded by parallelism,
    never by corpus size. Assignment = argmax over round(cosine, 6) with
    ties to the lowest cell id; update = per-cell element-wise SUM rounded
    to 6dp (scale-invariant equivalent of the mean under cosine
    assignment — one fewer cross-engine FP op); empty cells keep their
    previous centroid. The round-6 steps are what make the DuckDB replay
    (_kmeans_ctes) bit-reproducible: accumulation-order noise (~1e-15)
    sits far inside the 5e-7 rounding granularity, the same accepted
    tail-risk class as the rounded cosine compares elsewhere in this file.
    """
    import math

    import numpy as np
    import pandas as pd

    bc = spark.sparkContext.broadcast(C)

    def partial(batches):
        M = bc.value
        Mn = np.linalg.norm(M, axis=1)
        K, dim = M.shape
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf["embedding"]), dtype=np.float64)
            vn = np.linalg.norm(V, axis=1)
            sims = np.round((V @ M.T) / np.outer(vn, Mn), 6)
            cells = np.argmax(sims, axis=1)
            sums = np.zeros((K, dim))
            np.add.at(sums, cells, V)
            occ = np.unique(cells)
            yield pd.DataFrame({
                "cell": np.repeat(occ, dim).astype("int32"),
                "i": np.tile(np.arange(dim, dtype="int32"), len(occ)),
                "s": sums[occ].ravel(),
            })

    rows = data.mapInPandas(partial, "cell int, i int, s double").collect()
    parts: dict[tuple[int, int], list[float]] = {}
    for r in rows:
        parts.setdefault((r["cell"], r["i"]), []).append(r["s"])
    newC = C.copy()
    touched: dict[int, object] = {}
    for (c, i), vals in parts.items():
        vec = touched.get(c)
        if vec is None:
            vec = touched[c] = np.zeros(C.shape[1])
        vec[i] = round(math.fsum(vals), 6)
    for c, vec in touched.items():
        newC[c] = vec
    return newC


def _centroids(spark, sf_dir):
    """Spark-native spherical k-means codebook (KMEANS_ITERS rounds),
    seeded with the first N_CELLS corpus vectors. RAW (unnormalized)
    centroids — cosine assignment is scale-invariant, and skipping the
    normalize keeps one fewer FP op between this and the DuckDB oracle's
    unrolled replay (_kmeans_ctes), which recomputes the SAME centroids
    from the same seed. Memoized per (session, sf_dir): the training is
    deterministic, so ann_ivf_buckets / ann_search_ivf / ivf_assign share
    one codebook instead of re-running 5 jobs each."""
    import numpy as np

    key = (spark.sparkContext.applicationId, str(sf_dir))
    hit = _CODEBOOK_CACHE.get(key)
    if hit is not None:
        return hit
    emb = read_testdata(spark, sf_dir, "embeddings")
    seed = (emb.filter(F.col("vec_id") < N_CELLS)
            .select("vec_id", "embedding").toPandas()
            .sort_values("vec_id"))
    C = np.array(list(seed["embedding"]), dtype=np.float64)
    data = emb.select("embedding").persist()
    try:
        for _ in range(KMEANS_ITERS):
            C = _kmeans_round(spark, data, C)
    finally:
        data.unpersist()
    _CODEBOOK_CACHE[key] = C
    return C


def _kmeans_ctes() -> str:
    """DuckDB replay of _centroids: KMEANS_ITERS unrolled
    assign/sum/coalesce CTE triples ending in ``cent{KMEANS_ITERS}``.
    Mirrors the Spark training step for step — round-6 cosine assignment
    with lowest-cid ties, round-6 per-cell element-wise sums, empty cells
    inheriting the previous centroid."""
    ctes = [f"""cent0 AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings WHERE vec_id < {N_CELLS})"""]
    for t in range(1, KMEANS_ITERS + 1):
        prev = f"cent{t - 1}"
        ctes.append(f"""assign{t} AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cid AS cell,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[],
                                              c.cvec), 6) DESC,
                 c.cid) AS rn
        FROM embeddings e CROSS JOIN {prev} c) WHERE rn = 1)""")
        ctes.append(f"""sums{t} AS (
      SELECT cell AS cid, list(s ORDER BY i) AS cvec FROM (
        SELECT a.cell, t.i,
               round(sum(e.embedding[t.i + 1]::DOUBLE), 6) AS s
        FROM assign{t} a JOIN embeddings e USING (vec_id)
        CROSS JOIN range({_DIM}) t(i)
        GROUP BY a.cell, t.i) GROUP BY cell)""")
        ctes.append(f"""cent{t} AS (
      SELECT p.cid, coalesce(s.cvec, p.cvec) AS cvec
      FROM {prev} p LEFT JOIN sums{t} s USING (cid))""")
    return ",\n    ".join(ctes)


def ivf_assign(spark, sf_dir, with_embedding: bool = False,
               centroids=None) -> DataFrame:
    """(vec_id, cell[, embedding]): nearest-centroid cell per vector —
    one broadcast + one numpy matmul per Arrow batch, no shuffle."""
    import numpy as np
    import pandas as pd

    emb = read_testdata(spark, sf_dir, "embeddings")
    if centroids is None:
        centroids = _centroids(spark, sf_dir)
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches):
        M = bc.value
        Mn = np.linalg.norm(M, axis=1)
        for pdf in batches:
            v = np.array(list(pdf["embedding"]), dtype=np.float64)
            vn = np.linalg.norm(v, axis=1)
            # round to 6dp before argmax: makes the winning cell (and the
            # lowest-cid-on-tie rule, argmax takes the first max) exactly
            # reproducible in the DuckDB oracle's window ranking. Explicit
            # norms because the trained codebook is RAW (unnormalized).
            sims = np.round((v @ M.T) / np.outer(vn, Mn), 6)
            cells = np.argmax(sims, axis=1).astype("int32")
            out = {"vec_id": pdf["vec_id"], "cell": cells}
            if with_embedding:
                out["embedding"] = pdf["embedding"]
            yield pd.DataFrame(out)

    schema = ("vec_id long, cell int, embedding array<float>"
              if with_embedding else "vec_id long, cell int")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    return (emb.select("vec_id", "embedding").repartition(n_parts)
            .mapInPandas(assign, schema))


@register("ann_ivf_buckets")  # rows-only (centroid assignment is engine-specific)
def ann_ivf_buckets(spark, sf_dir):
    # Per-cell occupancy (one row per cell — richer than one aggregate).
    assigned = ivf_assign(spark, sf_dir)
    return (assigned.groupBy("cell").agg(F.count("*").alias("n_vectors"))
            .orderBy("cell"))


@register("ann_search_ivf", sql=f"""
    WITH {_kmeans_ctes()},
    cent AS (SELECT cid, cvec FROM cent{KMEANS_ITERS}),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cid AS cell,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec),
                       6) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, cell FROM (
        SELECT e.vec_id, c.cid AS cell,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec),
                       6) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < 5
      ) WHERE rn <= 2
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST(round(list_cosine_similarity(qe.embedding::DOUBLE[],
                                               ne.embedding::DOUBLE[]), 6)
                  AS DOUBLE) AS sim,
             row_number() OVER (PARTITION BY p.query_id ORDER BY
               round(list_cosine_similarity(qe.embedding::DOUBLE[],
                                            ne.embedding::DOUBLE[]), 6) DESC,
               a.vec_id) AS rank
      FROM probes p
      JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
      JOIN embeddings ne ON ne.vec_id = a.vec_id
      JOIN embeddings qe ON qe.vec_id = p.query_id
    ) WHERE rank <= 5
""")
def ann_search_ivf_q(spark, sf_dir):
    # Oracle-checked INCLUDING the training: the DuckDB side replays the
    # full 5-iteration k-means (_kmeans_ctes) from the same seed, so
    # codebook, assignment, probe choice, and rerank are all pinned —
    # not just the row count.
    return ann_search_ivf(spark, sf_dir, query_ids=[0, 1, 2, 3, 4], k=5)


def ann_search_ivf(spark, sf_dir, query_ids: list[int], k: int = 5,
                   nprobe: int = 2) -> DataFrame:
    """IVF-pruned top-k: each query probes its `nprobe` closest cells and
    exact-reranks only those cells' members. THE pruned ANN path here:
    measured on the sf0.001 embeddings (near-isotropic — the hard case),
    the trained codebook gives recall@5 of 0.72 scanning 6% of the corpus
    at nprobe=1 and 0.84 at 12% with nprobe=2 over the 5 oracle queries
    (tests/test_recall.py pins the floors); a wider 50-query sweep puts
    both the trained and the old first-16 codebook at ~0.5 recall at 12%
    scan — isotropic vectors have no cluster structure for ANY codebook
    to exploit, so k-means' real win on this corpus is BALANCED cell
    occupancy (25-43 members/cell vs the stand-in's skew): bounded probe
    fanout per task at 100 TB, not higher small-sample recall."""
    import numpy as np

    C = _centroids(spark, sf_dir)
    assigned = ivf_assign(spark, sf_dir, with_embedding=True, centroids=C)
    # Query side is K rows by definition — driver gather is bounded by the
    # query count, never the corpus.
    emb = read_testdata(spark, sf_dir, "embeddings")
    qrows = (emb.filter(F.col("vec_id").isin([int(q) for q in query_ids]))
             .select("vec_id", "embedding").collect())
    Cn = np.linalg.norm(C, axis=1)
    probes = []
    for r in qrows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        sims = np.round((C @ v) / (Cn * np.linalg.norm(v)), 6)
        ranked = sorted(range(len(sims)), key=lambda i: (-sims[i], i))
        for c in ranked[:nprobe]:
            probes.append((int(r["vec_id"]), int(c), list(r["embedding"])))
    qdf = spark.createDataFrame(
        probes, "query_id long, cell int, q_emb array<float>")
    sim = F.round(_cosine("q_emb", "embedding"), 6)
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("sim").desc(), F.col("neighbor_id")))
    return (assigned.join(F.broadcast(qdf),
                          (qdf.cell == assigned.cell)
                          & (F.col("query_id") != F.col("vec_id")))
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    sim.alias("sim"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


@register("ann_search_lsh")  # rows-only (buckets derive from Spark xxhash64);
def ann_search_lsh_q(spark, sf_dir):
    # recall vs brute-force ann_cosine_topk pinned by tests/test_recall.py.
    return ann_search_lsh(spark, sf_dir, query_ids=[0, 1, 2, 3, 4], k=5)


def _probe_masks(radius: int) -> list[int]:
    """All XOR masks over N_PLANES bits with popcount <= radius."""
    return [m for m in range(1 << N_PLANES) if bin(m).count("1") <= radius]


@register("ann_lsh_exhaustive_parity", sql="""
    -- Containment-style oracle for the LSH search machinery (VERDICT r4
    -- #7): at radius = N_PLANES the multi-probe search visits EVERY
    -- bucket, so its result must equal brute-force top-k exactly —
    -- signature computation, probe explosion, bucket join, rerank and
    -- window ranking all sit on the hash path. The DuckDB side computes
    -- exact top-k independently (it cannot see Spark's xxhash64 buckets
    -- and does not need to — full-radius coverage makes the bucket
    -- structure transparent). The SF-dependent partial-radius recall
    -- curve stays pytest-pinned (tests/test_recall.py).
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             CAST(round(list_cosine_similarity(q.embedding::DOUBLE[],
                                               n.embedding::DOUBLE[]), 6)
                  AS DOUBLE) AS sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
                                 n.embedding::DOUBLE[]), 6) DESC,
                        n.vec_id) AS rank
      FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
      WHERE q.vec_id < 5
    ) WHERE rank <= 5
""")
def ann_lsh_exhaustive_parity(spark, sf_dir):
    return ann_search_lsh(spark, sf_dir, query_ids=[0, 1, 2, 3, 4], k=5,
                          radius=N_PLANES)


def ann_search_lsh(spark, sf_dir, query_ids: list[int], k: int = 5,
                   radius: int = 2) -> DataFrame:
    """Multi-probe LSH top-k: each query probes every bucket within Hamming
    distance `radius` of its own signature, then exact-reranks the probed
    members. radius=0 is classic single-bucket LSH (recall ~0 on
    near-isotropic embeddings — measured); radius trades scan fraction
    for recall (tests/test_recall.py pins the measured curve). On this
    corpus IVF dominates — see ann_search_ivf — but multi-probe is the
    right LSH shape when signatures are precomputed and cells are skewed."""
    emb = read_testdata(spark, sf_dir, "embeddings")
    sig = emb.withColumn("bucket", _lsh_signature("embedding"))
    masks = F.array(*[F.lit(m) for m in _probe_masks(radius)])
    # Probe buckets are distinct per query (distinct XOR masks), so the
    # bucket join cannot produce duplicate (query, neighbor) rows.
    q = (sig.filter(F.col("vec_id").isin([int(x) for x in query_ids]))
         .withColumn("mask", F.explode(masks))
         .withColumn("probe", F.expr("int(bucket) ^ mask").cast("int"))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"), "probe"))
    n = sig.alias("n")
    sim = F.round(_cosine("q_emb", "n.embedding"), 6)
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("sim").desc(), F.col("neighbor_id")))
    return (n.join(F.broadcast(q),
                   (F.col("probe") == F.col("n.bucket"))
                   & (F.col("query_id") != F.col("n.vec_id")))
            .select("query_id",
                    F.col("n.vec_id").alias("neighbor_id"), sim.alias("sim"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# SemDeDup (r5): semantic near-duplicate pruning, cluster-scoped. The
# k-means codebook (the SAME _centroids training the IVF index uses)
# partitions the corpus into cells; pairwise cosine is computed ONLY
# within a cell, so the quadratic blow-up is bounded by cluster
# occupancy (balanced by training — tests/test_recall.py pins the
# spread) instead of corpus size. Per the SemDeDup keep policy, when
# two vectors in a cell exceed the similarity threshold the one with
# LOWER cosine-to-centroid survives (edge points carry more signal
# than cluster-core repeats; Abbas et al. 2023, arXiv:2303.09540 —
# public paper, method reimplemented from its description).
#
# 100 TB shape: ONE shuffle, keyed on cell; each task materializes only
# its cell's gram matrix (numpy, C-side). At real scale cells come from
# a larger codebook so occupancy stays ~constant as the corpus grows —
# the shuffle key count scales with data, the per-task cost does not.
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = 0.4  # same edge threshold as dedup_embedding_resolve


@register("dedup_semantic_semdedup", sql=f"""
    WITH {{KMEANS}},
    cent AS (SELECT cid, cvec FROM cent{KMEANS_ITERS}),
    assign AS (
      SELECT vec_id, cell, csim FROM (
        SELECT e.vec_id, c.cid AS cell,
               round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec),
                     6) AS csim,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec),
                       6) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    ), pairs AS (
      SELECT a.vec_id AS v, b.vec_id AS u, b.csim AS u_csim,
             round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                          eb.embedding::DOUBLE[]), 6) AS sim
      FROM assign a JOIN assign b
        ON a.cell = b.cell AND a.vec_id <> b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
    ), mo AS (
      SELECT v AS vec_id, max(sim) AS max_other FROM pairs GROUP BY v
    )
    SELECT a.vec_id, a.cell,
           CAST(a.csim AS DOUBLE) AS centroid_sim,
           CAST(coalesce(m.max_other, -2.0) AS DOUBLE) AS max_other_sim,
           NOT EXISTS (
             SELECT 1 FROM pairs p
             WHERE p.v = a.vec_id AND p.sim >= {SEMDEDUP_TAU}
               AND (p.u_csim < a.csim
                    OR (p.u_csim = a.csim AND p.u < a.vec_id))
           ) AS kept
    FROM assign a LEFT JOIN mo m USING (vec_id)
""".replace("{KMEANS}", _kmeans_ctes()))
def dedup_semantic_semdedup(spark, sf_dir):
    # Oracle-checked INCLUDING the training: DuckDB replays the full
    # k-means (same _kmeans_ctes as ann_search_ivf), the cell
    # assignment, every within-cell pair cosine, and the keep rule —
    # each vector's (cell, centroid_sim, max_other_sim, kept) is
    # value-hashed by the driver. Round-6 everywhere makes the >= TAU
    # compare and the (csim, vec_id) keeper ordering engine-exact.
    import numpy as np
    import pandas as pd

    C = _centroids(spark, sf_dir)
    bc = spark.sparkContext.broadcast(C)

    def assign(batches):
        M = bc.value
        Mn = np.linalg.norm(M, axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(list(pdf["embedding"]), dtype=np.float64)
            vn = np.linalg.norm(v, axis=1)
            sims = np.round((v @ M.T) / np.outer(vn, Mn), 6)
            cells = np.argmax(sims, axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "cell": cells.astype("int32"),
                "csim": sims[np.arange(len(cells)), cells],
                "embedding": pdf["embedding"],
            })

    def semdedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n = len(pdf)
        ids = pdf["vec_id"].to_numpy()
        csim = pdf["csim"].to_numpy()
        if n == 1:
            return pd.DataFrame({
                "vec_id": ids, "cell": pdf["cell"],
                "centroid_sim": csim,
                "max_other_sim": np.full(1, -2.0), "kept": [True]})
        V = np.array(list(pdf["embedding"]), dtype=np.float64)
        vn = np.linalg.norm(V, axis=1)
        S = np.round((V @ V.T) / np.outer(vn, vn), 6)
        np.fill_diagonal(S, -np.inf)
        max_other = S.max(axis=1)
        # keeper ordering: (csim ASC, vec_id ASC) — lower centroid-sim
        # wins, so rank_less[v, u] == u outranks v
        rank_less = (csim[None, :] < csim[:, None]) | (
            (csim[None, :] == csim[:, None]) & (ids[None, :] < ids[:, None]))
        dropped = ((S >= SEMDEDUP_TAU) & rank_less).any(axis=1)
        return pd.DataFrame({
            "vec_id": ids, "cell": pdf["cell"],
            "centroid_sim": csim, "max_other_sim": max_other,
            "kept": ~dropped})

    emb = read_testdata(spark, sf_dir, "embeddings")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    assigned = (emb.select("vec_id", "embedding").repartition(n_parts)
                .mapInPandas(assign, "vec_id long, cell int, csim double, "
                                     "embedding array<float>"))
    return assigned.groupBy("cell").applyInPandas(
        semdedup_cell, "vec_id long, cell int, centroid_sim double, "
                       "max_other_sim double, kept boolean")
