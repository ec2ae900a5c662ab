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

from __future__ import annotations

import random

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

    e = sources.table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
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


def lsh_buckets_expr(emb: Column) -> Column:
    """Array of (table_id, bucket) structs: per table, bucket bit j =
    sign(emb · plane_tj). All JVM-side higher-order functions."""
    tables = []
    for t, planes in enumerate(_PLANES):
        bucket = F.lit(0)
        for j, plane in enumerate(planes):
            d = F.aggregate(
                F.zip_with(emb, F.array(*[F.lit(v) for v in plane]), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
        tables.append(F.struct(F.lit(t).alias("table_id"), bucket.alias("bucket")))
    return F.array(*tables)


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

    e = sources.table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    keyed = e.select(
        "vec_id", "emb", F.explode(lsh_buckets_expr(F.col("emb"))).alias("k")
    ).select("vec_id", "emb", "k.table_id", "k.bucket")
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
