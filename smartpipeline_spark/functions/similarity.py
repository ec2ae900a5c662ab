"""Similarity search over the ``embeddings`` table.

* ``ext_knn_bruteforce`` — exact top-k cosine neighbors; the
  correctness baseline, DuckDB-oracled via list_cosine_similarity.
  The query set broadcasts, the corpus streams: cost is one scan of
  the corpus per batch of queries, fully partition-parallel.
* ``ext_knn_lsh`` — random-hyperplane LSH bucketing, the scale path:
  corpus is bucketed once (a write-once index at 100 TB), queries
  probe only their bucket; recall measured against brute force in
  pytest rather than hash-matched.

Dot products use built-in higher-order functions (zip_with +
aggregate) — JVM-side, no Python. For very wide vectors a pandas_udf
over Arrow would amortize better; at dim<=1024 the built-ins win.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf must
# evaluate the pd.Series type hints at decoration time
import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from smartpipeline_spark import sources
from smartpipeline_spark.functions import ext_query

K_NEIGHBORS = 10
N_QUERIES = 10  # vec_id < 10 are the query vectors
_DIM = 64

# Multi-table hyperplane LSH: collision prob for angle θ is
# (1-θ/π)^BITS per table, 1-(1-p)^TABLES overall. Random 64-d vectors
# put true neighbors at θ≈60-70°, so one wide table has ~0 recall;
# 16 tables × 4 bits gives ~0.95 union recall there while still
# cutting each probe to ~1/2^4 of the corpus per table.
_N_TABLES = 16
_BITS_PER_TABLE = 4

_rng = random.Random(7)
# fixed random hyperplanes (deterministic across runs / both paths)
_PLANES = [
    [[_rng.gauss(0.0, 1.0) for _ in range(_DIM)] for _ in range(_BITS_PER_TABLE)]
    for _ in range(_N_TABLES)
]


def _emb(spark, sf_dir) -> DataFrame:
    """Embeddings with double vectors, repartitioned: the test corpus
    is one parquet file (one partition — serial); the hyperplane/dot
    math is CPU-bound, so spread it first. Width adapts to corpus
    size (~500 vectors per task floor) — over-splitting a small corpus
    costs more in per-task/python-worker overhead than it buys
    (measured: 5k vectors run faster on 8 tasks than 32)."""
    raw = sources.table(spark, "embeddings", sf_dir)
    rows = raw.count()  # parquet metadata only — no data scan
    width = max(1, min(spark.sparkContext.defaultParallelism, rows // 500))
    return raw.repartition(width).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )


def round4(col: Column) -> Column:
    """Engine-portable 4-dec rounding (see relational.r2 rationale)."""
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential left-to-right double summation — matches the oracle's
    evaluation order so values agree to ~1 ulp."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


@ext_query(
    "ext_knn_bruteforce",
    f"""WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
                  WHERE vec_id < {N_QUERIES}),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 FLOOR(list_cosine_similarity(q.emb, c.emb) * 10000.0 + 0.5)
                   / 10000.0 AS score
          FROM q JOIN c ON q.vec_id <> c.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id, score,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, rank, score
        FROM ranked WHERE rank <= {K_NEIGHBORS}""",
)
def ext_knn_bruteforce(spark, sf_dir):
    """Exact ANN baseline: broadcast the query set against the corpus,
    rank per query with a window over (rounded score, neighbor_id) so
    ordering is deterministic in both engines."""
    from pyspark.sql.window import Window

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            round4(cosine_expr(F.col("q_emb"), F.col("emb"))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K_NEIGHBORS)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def _lsh_buckets_udf():
    """All-table hyperplane signatures in one vectorized Pandas UDF:
    a (batch x dim) @ (dim x tables*bits) numpy matmul, sign-packed to
    one bucket int per table. Spark's higher-order functions are
    interpreted (no codegen), so 64 per-row aggregate() dot products
    cost ~10x more than this single Arrow-batched matmul — the
    documented exception where a vectorized UDF beats built-ins."""
    planes = np.array(_PLANES, dtype=np.float64)  # (tables, bits, dim)
    flat = planes.reshape(_N_TABLES * _BITS_PER_TABLE, _DIM)  # (t*b, dim)
    weights = (1 << np.arange(_BITS_PER_TABLE)).astype(np.int64)

    @F.pandas_udf("array<int>")
    def buckets(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())  # (n, dim)
        bits = (m @ flat.T) > 0  # (n, tables*bits)
        bits = bits.reshape(len(m), _N_TABLES, _BITS_PER_TABLE)
        vals = (bits * weights).sum(axis=2)  # (n, tables)
        return pd.Series(list(vals.astype("int32")))

    return buckets


@ext_query(
    "ext_embedding_centroids",
    """SELECT label, i AS pos,
              FLOOR(AVG(embedding[i]) * 10000.0 + 0.5) / 10000.0 AS centroid
       FROM embeddings, LATERAL (
         SELECT unnest(generate_series(1, len(embedding))) AS i) t
       GROUP BY label, i""",
)
def ext_embedding_centroids(spark, sf_dir):
    """Per-label centroid vectors via posexplode + groupBy(label, pos):
    the standard distributed reduction for k-means-style updates —
    shuffle carries (label, pos, partial sums), never whole vectors."""
    e = sources.table(spark, "embeddings", sf_dir)
    return (
        e.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(round4(F.avg("v")).alias("centroid"))
    )


@ext_query("ext_knn_lsh")  # recall-tested in pytest against brute force
def ext_knn_lsh(spark, sf_dir):
    """LSH-bucketed ANN, the scale path: the corpus is hashed once
    into _N_TABLES independent bucket keys (at 100 TB: a write-once
    table partitioned by (table_id, bucket), probe many); each query
    scores only the union of its 16 buckets instead of the full
    corpus. Candidates dedup on (query_id, neighbor_id) before the
    exact re-score, so multi-table hits cost one cosine each."""
    from pyspark.sql.window import Window

    e = _emb(spark, sf_dir)
    buckets = _lsh_buckets_udf()
    from pyspark import StorageLevel

    # both the probe side and the corpus side read `keyed`: persist so
    # the signature UDF runs one pass over the corpus, not two (at
    # 100 TB this persist IS the write-once (table_id, bucket) index)
    keyed = e.select(
        "vec_id", "emb", F.posexplode(buckets(F.col("emb"))).alias("table_id", "bucket")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    q = keyed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("table_id").alias("q_table"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = (
        keyed.join(
            F.broadcast(q),
            (F.col("table_id") == F.col("q_table"))
            & (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "q_emb", F.col("vec_id").alias("neighbor_id"), "emb")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        round4(cosine_expr(F.col("q_emb"), F.col("emb"))).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K_NEIGHBORS)
        .select("query_id", "neighbor_id", "rank", "score")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path next to LSH
# ---------------------------------------------------------------------------

_IVF_K = 16  # coarse cells
# nprobe=8 probes half the cells: necessary on THIS corpus because the
# synthetic embeddings are i.i.d. gaussian — true neighbors sit at
# cosine ~0.4, barely inside cell locality. Clustered real-world
# embeddings run nprobe ~k/8 at much higher recall; the knob is the
# recall/throughput dial either way.
_IVF_NPROBE = 8
_IVF_SAMPLE_CAP = 2048  # training sample collected to the driver
_IVF_ITERS = 5


def _ivf_centroids(e: DataFrame) -> np.ndarray:
    """Seeded k-means over a BOUNDED deterministic sample (<=2048
    vectors, ~1 MB at dim 64) collected to the driver — the standard
    IVF training recipe (FAISS trains coarse quantizers on a sample
    too): training cost is constant in corpus size, the full corpus is
    only ever *assigned*, never iterated. Deterministic: sample =
    ordered vec_id stride, init = evenly spaced sample rows, fixed
    iteration count."""
    sample = (
        e.filter(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id")
        .limit(_IVF_SAMPLE_CAP)
        .select("emb")
        .collect()
    )
    m = np.array([r["emb"] for r in sample], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True) + 1e-12
    cents = m[:: max(1, len(m) // _IVF_K)][:_IVF_K].copy()
    for _ in range(_IVF_ITERS):
        assign = (m @ cents.T).argmax(axis=1)  # cosine on normalized rows
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                mu = members.mean(axis=0)
                cents[c] = mu / (np.linalg.norm(mu) + 1e-12)
    return cents


def _ivf_cells_udf(cents: np.ndarray, nprobe: int):
    """Vectorized cell assignment: one Arrow-batched matmul against the
    (tiny, closure-broadcast) centroid matrix; returns the nprobe
    nearest cell ids per vector. nprobe=1 indexes the corpus, nprobe=N
    probes for queries."""

    @F.pandas_udf("array<int>")
    def cells(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        sims = m @ cents.T  # (n, k)
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(top))

    return cells


def _exact_topk(cands: DataFrame) -> DataFrame:
    """Shared tail of every ANN path: exact cosine re-score of the
    candidate set, deterministic per-query top-k."""
    from pyspark.sql.window import Window

    scored = cands.select(
        "query_id",
        "neighbor_id",
        round4(cosine_expr(F.col("q_emb"), F.col("emb"))).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K_NEIGHBORS)
        .select("query_id", "neighbor_id", "rank", "score")
    )


@ext_query("ext_knn_ivf")  # recall-tested in pytest against brute force
def ext_knn_ivf(spark, sf_dir):
    """IVF-bucketed ANN: corpus vectors are assigned to their single
    nearest coarse centroid (at 100 TB: a write-once index partitioned
    by cell — training reads a constant-size sample, assignment is one
    linear pass); each query probes its _IVF_NPROBE nearest cells, so
    the scored fraction is ~nprobe/k of the corpus regardless of
    scale. Candidates get an exact cosine re-score, making false
    candidates cost recall nothing."""
    e = _emb(spark, sf_dir)
    cents = _ivf_centroids(e)
    corpus_cell = _ivf_cells_udf(cents, 1)
    probe_cells = _ivf_cells_udf(cents, _IVF_NPROBE)
    keyed = e.select("vec_id", "emb", F.element_at(corpus_cell(F.col("emb")), 1).alias("cell"))
    q = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.explode(probe_cells(F.col("emb"))).alias("cell"),
        )
    )
    cands = (
        keyed.join(F.broadcast(q), ["cell"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_emb", F.col("vec_id").alias("neighbor_id"), "emb")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _exact_topk(cands)
