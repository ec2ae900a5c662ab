"""Similarity search over the ``embeddings`` table.

* ``ext_knn_bruteforce`` — exact top-k cosine neighbors; the
  correctness baseline, DuckDB-oracled via list_cosine_similarity.
  The query set broadcasts, the corpus streams: cost is one scan of
  the corpus per batch of queries, fully partition-parallel.
* ``ext_knn_lsh`` — random-hyperplane LSH bucketing, the scale path:
  corpus is bucketed once (a write-once index at 100 TB), queries
  probe only their bucket. Oracled as of r10 by a FULL SEMANTIC
  REPLAY: the hyperplanes are fixed literals, so the DuckDB oracle
  recomputes the same signatures (list_dot_product against the same
  plane constants), bucket-joins, dedups and exact-re-scores — it
  grades the bucketing itself, not merely recall containment. Recall
  vs brute force additionally measured in pytest.

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
from pyspark.sql.window import Window

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


_EMB_WIDTH: dict[str, int] = {}  # sf_dir -> repartition width (corpus is static)


def _emb(spark, sf_dir) -> DataFrame:
    """Embeddings with double vectors, repartitioned: the test corpus
    is one parquet file (one partition — serial); the hyperplane/dot
    math is CPU-bound, so spread it first. Width adapts to corpus
    size (~500 vectors per task floor) — over-splitting a small corpus
    costs more in per-task/python-worker overhead than it buys
    (measured: 5k vectors run faster on 8 tasks than 32).

    The sizing ``count()`` is metadata-only but still schedules a job
    per call; at 100 TB with hundreds of query batches that is pure
    driver traffic, so the width is computed ONCE per corpus path and
    cached (the corpus is a static snapshot — an appended corpus
    arrives under a new path/partition, not by mutating this one)."""
    raw = sources.table(spark, "embeddings", sf_dir)
    width = _EMB_WIDTH.get(sf_dir)
    if width is None:
        rows = raw.count()  # parquet metadata only — no data scan
        width = max(1, min(spark.sparkContext.defaultParallelism, rows // 500))
        _EMB_WIDTH[sf_dir] = width
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


# Exact top-k oracle, shared by ext_knn_bruteforce AND (round 9)
# ext_knn_hnsw: on the fixture ladder the sharded-HNSW candidate union
# contains the true top-k for every query (verified bit-exact
# including rounded scores at sf0.001/0.01/0.1), so the exact ranking
# is the correct — and regression-sensitive — oracle for both. If the
# HNSW build parameters or the embeddings fixture ever change, re-run
# that equality check before trusting a red row as a semantics bug.
_KNN_TOPK_ORACLE = f"""WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
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
        FROM ranked WHERE rank <= {K_NEIGHBORS}"""


@ext_query("ext_knn_bruteforce", _KNN_TOPK_ORACLE)
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


# ---------------------------------------------------- MMR diversification
# Maximal Marginal Relevance (Carbonell & Goldstein '98): greedy top-k
# that trades relevance against redundancy — next pick maximizes
# λ·rel(q,c) − (1−λ)·max_{s∈selected} sim(c,s). The curation use is
# diversified selection (search results, few-shot example pools,
# training-subset picking after dedup); relevance-only top-k returns
# near-duplicate clusters, MMR spends the k slots on coverage.
_MMR_POOL = 24  # relevance pool per query the greedy runs over
_MMR_K = 8      # diversified picks per query
_MMR_LAMBDA = 0.7

_MMR_ORACLE = f"""WITH RECURSIVE
 q AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
       WHERE vec_id < {N_QUERIES}),
 c AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
 scored AS (
   SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          FLOOR(list_cosine_similarity(q.emb, c.emb) * 10000.0 + 0.5)
            / 10000.0 AS rel
   FROM q JOIN c ON q.vec_id <> c.vec_id),
 pool AS (
   SELECT * FROM (
     SELECT query_id, neighbor_id, rel,
            ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rel DESC, neighbor_id) AS rnk
     FROM scored) ranked WHERE rnk <= {_MMR_POOL}),
 pairs AS (
   SELECT a.query_id, a.neighbor_id AS i, b.neighbor_id AS j,
          FLOOR(list_cosine_similarity(ea.emb, eb.emb) * 10000.0 + 0.5)
            / 10000.0 AS s
   FROM pool a JOIN pool b ON a.query_id = b.query_id
                          AND a.neighbor_id <> b.neighbor_id
   JOIN c ea ON ea.vec_id = a.neighbor_id
   JOIN c eb ON eb.vec_id = b.neighbor_id),
 sel AS (
   SELECT query_id, 1 AS step, neighbor_id AS picked,
          {_MMR_LAMBDA} * rel AS mmr, [neighbor_id] AS sel_ids
   FROM pool WHERE rnk = 1
   UNION ALL
   SELECT s.query_id, s.step + 1, nxt.neighbor_id, nxt.mmr,
          list_append(s.sel_ids, nxt.neighbor_id)
   FROM sel s, LATERAL (
     SELECT p.neighbor_id,
            {_MMR_LAMBDA} * p.rel - {1.0 - _MMR_LAMBDA} * (
              SELECT MAX(pr.s) FROM pairs pr
              WHERE pr.query_id = p.query_id AND pr.i = p.neighbor_id
                AND list_contains(s.sel_ids, pr.j)) AS mmr
     FROM pool p
     WHERE p.query_id = s.query_id
       AND NOT list_contains(s.sel_ids, p.neighbor_id)
     ORDER BY mmr DESC, p.neighbor_id
     LIMIT 1) nxt
   WHERE s.step < {_MMR_K})
SELECT query_id, picked AS neighbor_id, step AS mmr_rank,
       FLOOR(mmr * 10000.0 + 0.5) / 10000.0 AS mmr_score
FROM sel"""


def _spread_groups(df: DataFrame, n_groups: int, col: str) -> DataFrame:
    """One partition per group ahead of a CPU-heavy applyInPandas.

    AQE's small-shuffle coalescing sees a few KB behind the groupBy
    exchange and merges everything into ONE reduce partition, which
    serializes every per-group kernel into a single Python worker
    (measured: 4 one-second graph builds ran in 4.9s). An explicit
    repartition is exempt from coalescing, and RANGE partitioning
    (not hash) is what guarantees distinct groups land in distinct
    partitions — the group labels are small consecutive ints whose
    murmur3 values collide at practical partition counts (ids 0 and 1
    collide mod 16/32/64). Catalyst accepts the range layout as
    satisfying the groupBy clustering, so no second exchange appears;
    the range sampling pass costs one cheap job on the tiny keyed
    frame. Only worth it when per-group kernel CPU dominates — plain
    data-bound groupBys should keep letting AQE coalesce."""
    return df.repartitionByRange(max(1, n_groups), col)


def mmr_diversify(
    pool: DataFrame,
    k: int = _MMR_K,
    lam: float = _MMR_LAMBDA,
) -> DataFrame:
    """Greedy MMR over a per-query candidate pool: ``pool`` carries
    (query_id, neighbor_id, rel, emb) with at most a few dozen rows
    per query (the output of ANY first-stage retriever — brute,
    LSH/IVF/HNSW — which is where the scale knob lives). One
    applyInPandas group per query: the greedy is O(pool²·k) on a
    pool that is bounded BY CONTRACT, pairwise similarities are one
    (pool × pool) matrix per group, and nothing touches the driver —
    at 100 TB the cost profile is the retriever's, MMR re-ranking is
    noise. Pairwise cosines accumulate dimension-by-dimension
    (``Σ_d outer(E_d, E_d)``) so every pair reproduces the sequential
    fold order of :func:`cosine_expr` bit-for-bit, then round to the
    4-decimal grid shared with the DuckDB oracle; the λ-blend runs on
    those rounded doubles, so both engines walk identical argmax
    (tie: lowest id) paths."""
    import numpy as np
    import pandas as pd

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["rel", "neighbor_id"], ascending=[False, True]
        ).reset_index(drop=True)
        n = len(pdf)
        E = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])
        dots = np.zeros((n, n))
        norms = np.zeros(n)
        for d in range(E.shape[1]):  # fold order: acc + x*x, dim by dim
            col = E[:, d]
            dots += np.outer(col, col)
            norms += col * col
        nrm = np.sqrt(norms)
        sim = np.floor(dots / np.outer(nrm, nrm) * 10000.0 + 0.5) / 10000.0
        rel = pdf["rel"].to_numpy(dtype=np.float64)
        ids = pdf["neighbor_id"].to_numpy()
        picks, scores = [0], [lam * rel[0]]
        penalty = sim[:, 0].copy()
        while len(picks) < min(k, n):
            best = -1
            best_v = None
            for i in range(n):
                if i in picks:
                    continue
                v = lam * rel[i] - (1.0 - lam) * penalty[i]
                if best < 0 or v > best_v or (v == best_v and ids[i] < ids[best]):
                    best, best_v = i, v
            picks.append(best)
            scores.append(best_v)
            np.maximum(penalty, sim[:, best], out=penalty)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "neighbor_id": ids[picks],
                "mmr_rank": np.arange(1, len(picks) + 1, dtype=np.int32),
                "mmr_score": np.floor(
                    np.asarray(scores) * 10000.0 + 0.5
                ) / 10000.0,
            }
        )

    # NO _spread_groups here: the greedy kernel is ~20ms/group, so the
    # range-sampling job costs more than AQE's coalesced single task
    # (measured 0.68s -> 0.93s) — the helper's own "only when kernel
    # CPU dominates" rule, applied.
    return pool.groupBy("query_id").applyInPandas(
        kernel,
        "query_id long, neighbor_id long, mmr_rank int, mmr_score double",
    )


@ext_query("ext_mmr_diversify", _MMR_ORACLE)
def ext_mmr_diversify(spark, sf_dir):
    """MMR-diversified top-k: brute relevance pool (same broadcast
    shape as ext_knn_bruteforce, pool of _MMR_POOL=24) re-ranked by
    :func:`mmr_diversify` (λ=0.7, k=8). The DuckDB oracle replays the
    greedy exactly as a recursive CTE carrying the selected list,
    re-picking each step's argmax with a LATERAL top-1."""
    from pyspark.sql.window import Window

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "emb",
        round4(cosine_expr(F.col("q_emb"), F.col("emb"))).alias("rel"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("neighbor_id")
    )
    pool = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _MMR_POOL)
        .select("query_id", "neighbor_id", "rel", "emb")
    )
    return mmr_diversify(pool)


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


def _lsh_oracle() -> str:
    """DuckDB oracle for ext_knn_lsh: a FULL SEMANTIC REPLAY of the
    LSH pipeline rather than a containment argument (the HNSW recipe
    does not transfer here: on this i.i.d.-gaussian corpus true
    neighbors sit at θ≈70°, so a candidate union ⊇ true top-k would
    need to probe essentially the whole corpus — measured r10:
    16×4-bit tables miss 21–43 of the 100 true pairs across the
    ladder). Instead the oracle re-derives the SAME bucketing from
    the SAME fixed hyperplanes, emitted as literals from _PLANES via
    repr (single source of truth with the Pandas-UDF path):
    signature = Σ (dot(emb, plane)>0) << bit per table, candidates =
    distinct (query, corpus) pairs sharing any (table_id, bucket),
    then the exact rounded re-score and (score desc, neighbor_id)
    top-k — so the driver row grades hyperplane math, sign packing,
    multi-table union, dedup AND re-rank end-to-end.

    Cross-engine sign robustness: numpy's matmul and DuckDB's
    list_dot_product sum in different orders, so a dot within ~1e-13
    of zero could flip a bit. Measured margin on the frozen fixture:
    min |dot| over corpus × all 64 planes = 3.1e-7 (sf0.1), 2.1e-5
    (sf0.001), 8.3e-5 (sf0.01) — six orders above summation noise;
    replay verified exact-equal at all three sfs (r10)."""
    rows = []
    for t, planes in enumerate(_PLANES):
        for b, p in enumerate(planes):
            lit = "[" + ",".join(repr(x) for x in p) + "]"
            rows.append(f"({t},{b},{lit}::DOUBLE[])")
    values = ",\n".join(rows)
    return f"""WITH planes(table_id, bit, plane) AS (VALUES {values}),
 c AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
 sigs AS (
   SELECT e.vec_id, p.table_id,
          CAST(SUM(CASE WHEN list_dot_product(e.emb, p.plane) > 0
                        THEN 1 << p.bit ELSE 0 END) AS INT) AS bucket
   FROM c e CROSS JOIN planes p
   GROUP BY e.vec_id, p.table_id),
 cand AS (
   SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS neighbor_id
   FROM sigs qs JOIN sigs cs
     ON qs.table_id = cs.table_id AND qs.bucket = cs.bucket
   WHERE qs.vec_id < {N_QUERIES} AND cs.vec_id <> qs.vec_id),
 scored AS (
   SELECT cand.query_id, cand.neighbor_id,
          FLOOR(list_cosine_similarity(eq.emb, ec.emb) * 10000.0 + 0.5)
            / 10000.0 AS score
   FROM cand JOIN c eq ON eq.vec_id = cand.query_id
             JOIN c ec ON ec.vec_id = cand.neighbor_id),
 ranked AS (
   SELECT query_id, neighbor_id, score,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY score DESC, neighbor_id) AS rank
   FROM scored)
SELECT query_id, neighbor_id, rank, score FROM ranked WHERE rank <= {K_NEIGHBORS}"""


@ext_query("ext_knn_lsh", _lsh_oracle())
def ext_knn_lsh(spark, sf_dir):
    """LSH-bucketed ANN, the scale path: the corpus is hashed once
    into _N_TABLES independent bucket keys (at 100 TB: a write-once
    table partitioned by (table_id, bucket), probe many); each query
    scores only the union of its 16 buckets instead of the full
    corpus. Candidates dedup on (query_id, neighbor_id) before the
    exact re-score, so multi-table hits cost one cosine each.
    Oracled as of r10 by the full semantic replay in
    :func:`_lsh_oracle` (the hyperplanes are fixed literals shared
    between both engines); recall vs brute force stays pytest-pinned
    on top."""
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
    keyed = _ivf_keyed(e, cents)
    probe_cells = _ivf_cells_udf(cents, _IVF_NPROBE)
    q = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.explode(probe_cells(F.col("emb"))).alias("cell"),
        )
    )
    return _exact_topk(_ivf_candidates(keyed, q))


def _ivf_keyed(e: DataFrame, cents: np.ndarray) -> DataFrame:
    """Corpus vectors tagged with their single nearest cell — the
    index content, shared by the inline path and the saved layout."""
    corpus_cell = _ivf_cells_udf(cents, 1)
    return e.select(
        "vec_id", "emb", F.element_at(corpus_cell(F.col("emb")), 1).alias("cell")
    )


def _ivf_candidates(
    keyed: DataFrame, q: DataFrame, exclude_self: bool = True
) -> DataFrame:
    """Shared candidate algebra of every IVF path (inline and saved
    index): cell-equi join, self-match filter, per-(query, neighbor)
    dedup across probed cells. One definition — the saved-index path
    is equality-tested against the inline path, and divergent copies
    here would break that silently.

    ID-NAMESPACE CONTRACT: ``exclude_self`` assumes query_id and the
    corpus vec_id share one namespace (the corpus-self-join deployment
    every inline key runs). An EXTERNAL query batch whose ids can
    coincidentally collide with unrelated corpus vec_ids must pass
    ``exclude_self=False`` or it silently loses those neighbors."""
    j = keyed.join(F.broadcast(q), ["cell"])
    if exclude_self:
        j = j.filter(F.col("vec_id") != F.col("query_id"))
    return j.select(
        "query_id", "q_emb", F.col("vec_id").alias("neighbor_id"), "emb"
    ).dropDuplicates(["query_id", "neighbor_id"])


def build_ivf_index(e: DataFrame, path: str) -> None:
    """Materialize the IVF index the inline query recomputes: corpus
    vectors written PARTITIONED BY their nearest-centroid cell, plus
    the trained centroids as ``_centroids.json`` in the index root.
    This is the write-once form of the 100 TB contract: train on a
    constant-size sample, assign the corpus in one linear pass, pay
    the layout once — every later query batch reads only its probed
    cell directories (verified in tests via the scan's partition
    filters), not the corpus."""
    import json
    import os

    cents = _ivf_centroids(e)
    _ivf_keyed(e, cents).write.mode("overwrite").partitionBy("cell").parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as fh:
        json.dump(cents.tolist(), fh)


def _ivf_assign_udf(cents: np.ndarray):
    """Top-1 cell assignment WITH the achieved cosine — one Arrow
    matmul per batch, shared by index maintenance (the cell routes the
    row; the sim feeds the drift report)."""

    @F.pandas_udf("struct<cell:int, sim:double>")
    def assign(emb: pd.Series) -> pd.DataFrame:
        m = np.stack(emb.to_numpy())
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        sims = m @ cents.T
        cell = sims.argmax(axis=1).astype("int32")
        return pd.DataFrame(
            {"cell": cell, "sim": sims[np.arange(len(cell)), cell]}
        )

    return assign


def append_to_ivf_index(
    spark,
    path: str,
    new_vectors: DataFrame,
    concentration_factor: float = 4.0,
) -> dict:
    """Incremental IVF maintenance: real corpora APPEND, and a rebuild
    per append is the anti-pattern a 100 TB index exists to avoid. New
    vectors are assigned with the SAVED centroids (existing cell
    contents stay untouched and valid — readers see a consistent
    quantizer throughout) and appended into their cell partitions; the
    corpus moves once, the centroids move never.

    The cost of never retraining is quantizer drift, so the append
    returns a drift report: ``max_cell_frac`` is the hottest cell's
    share of this batch (a batch from the trained distribution spreads
    ~uniformly; a novel cluster the quantizer never saw piles into one
    cell, degrading both balance and recall), and ``mean_sim`` is the
    batch's mean cosine to its assigned centroid (falling fit).
    ``retrain_recommended`` fires when the hottest cell exceeds
    ``concentration_factor`` x the uniform share — the signal to
    retrain + re-layout, which is a new index build, not a mutation."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as fh:
        cents = np.array(json.load(fh))
    assign = _ivf_assign_udf(cents)
    assigned = (
        new_vectors.select("vec_id", "emb", assign(F.col("emb")).alias("a"))
        .select("vec_id", "emb", F.col("a.cell").alias("cell"), F.col("a.sim").alias("sim"))
        .persist()
    )
    stats = assigned.groupBy("cell").agg(
        F.count("*").alias("n"), F.sum("sim").alias("s")
    ).collect()
    n = sum(r["n"] for r in stats)
    assigned.select("vec_id", "emb", "cell").write.mode("append").partitionBy(
        "cell"
    ).parquet(path)
    assigned.unpersist()
    max_frac = (max(r["n"] for r in stats) / n) if n else 0.0
    uniform = 1.0 / len(cents)
    return {
        "appended": n,
        "cells_touched": len(stats),
        "mean_sim": (sum(r["s"] for r in stats) / n) if n else None,
        "max_cell_frac": max_frac,
        "retrain_recommended": max_frac > concentration_factor * uniform,
    }


def query_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    nprobe: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """ANN top-k against a saved :func:`build_ivf_index` layout.
    ``queries`` carries (query_id, q_emb). The probed cell ids become
    an IN-filter on the index's PARTITION column, so the parquet scan
    opens only nprobe directories per query batch — the remaining
    ~(k - nprobe)/k of the corpus is pruned before any IO. Candidates
    get the same exact cosine re-score as every other ANN path.

    ``exclude_self=True`` (the default, matching the inline keys)
    assumes query_id SHARES the corpus vec_id namespace and drops
    exact-id matches as self-hits. Callers querying with an external
    id namespace (ids minted outside the index) must pass
    ``exclude_self=False`` — otherwise a query whose id coincidentally
    equals an unrelated corpus vec_id silently loses that neighbor."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as fh:
        cents = np.array(json.load(fh))
    probe = _ivf_cells_udf(cents, nprobe if nprobe is not None else _IVF_NPROBE)
    # materialized: the frame is consumed twice (distinct-cells collect
    # for the partition filter, then the candidate join) — without this
    # the upstream query pipeline AND the Arrow cell-assignment UDF run
    # as two full jobs. localCheckpoint, not persist: the returned plan
    # keeps reading it, so a persist here could never be unpersisted
    # and would leak a CacheManager entry per query batch.
    q = queries.select(
        "query_id", "q_emb", F.explode(probe(F.col("q_emb"))).alias("cell")
    ).localCheckpoint(eager=True)
    probed = [r.cell for r in q.select("cell").distinct().collect()]
    idx = spark.read.parquet(path).filter(F.col("cell").isin(probed))
    return _exact_topk(_ivf_candidates(idx, q, exclude_self))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bound ANN scale path
# ---------------------------------------------------------------------------

_PQ_M = 8  # subquantizers (dim 64 -> 8 subvectors of 8)
_PQ_K = 256  # codes per subquantizer (1 byte each)
_PQ_ITERS = 5
_PQ_RERANK = 100  # ADC candidates re-scored exactly per query


def _pq_codebooks(e: DataFrame) -> np.ndarray:
    """Per-subspace k-means codebooks, (m, k, d/m) — trained on the
    SAME bounded deterministic driver sample as the IVF coarse
    quantizer (constant cost in corpus size; the corpus is only ever
    encoded, never iterated). L2 k-means per subspace (the standard PQ
    objective, Jégou et al. "Product Quantization for Nearest Neighbor
    Search"); scoring later uses inner products against these
    centroids, the FAISS METRIC_INNER_PRODUCT arrangement."""
    sample = (
        e.filter(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id")
        .limit(_IVF_SAMPLE_CAP)
        .select("emb")
        .collect()
    )
    m = np.array([r["emb"] for r in sample], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True) + 1e-12
    d = m.shape[1]
    ds = d // _PQ_M
    books = np.empty((_PQ_M, _PQ_K, ds))
    for j in range(_PQ_M):
        sub = m[:, j * ds : (j + 1) * ds]
        cents = sub[:: max(1, len(sub) // _PQ_K)][:_PQ_K].copy()
        if len(cents) < _PQ_K:  # tiny corpus: pad by repetition
            cents = np.resize(cents, (_PQ_K, ds))
        for _ in range(_PQ_ITERS):
            # L2 assignment via the expanded form; sub-norms constant
            # per iteration so argmin(-2 s.c + |c|^2) suffices
            d2 = -2.0 * (sub @ cents.T) + (cents**2).sum(axis=1)
            assign = d2.argmin(axis=1)
            for c in range(_PQ_K):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def _pq_encode_udf(books: np.ndarray):
    """Corpus encoder: (m) uint8-range codes per vector — one Arrow
    batch matmul per subspace. The encoded corpus is m bytes/vector
    (64x smaller than float64 at dim 64, packable to binary on disk)
    — the representation that lets a 100 TB corpus's index live in
    cluster memory."""
    m_, ds = books.shape[0], books.shape[2]
    flat = books  # closure-broadcast, ~0.5 MB

    @F.pandas_udf("array<int>")
    def enc(emb: pd.Series) -> pd.Series:
        x = np.stack(emb.to_numpy())
        x = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
        codes = np.empty((len(x), m_), dtype="int64")
        for j in range(m_):
            sub = x[:, j * ds : (j + 1) * ds]
            d2 = -2.0 * (sub @ flat[j].T) + (flat[j] ** 2).sum(axis=1)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return enc


def _query_matrix(df: DataFrame, id_col: str = "vec_id", emb_col: str = "emb"):
    """BOUNDED driver collect of the query batch (ANN queries arrive
    in small batches by contract — same bound as query_ivf_index's
    probe collect), returned as (ids, row-normalized matrix) sorted by
    id for determinism."""
    qrows = sorted(df.select(id_col, emb_col).collect(), key=lambda r: r[id_col])
    if not qrows:
        raise ValueError(
            "empty query batch: the ANN query frame produced no rows "
            "(np.stack on nothing would raise an opaque numpy error)"
        )
    qids = np.array([r[id_col] for r in qrows])
    qm = np.stack([np.array(r[emb_col], dtype=np.float64) for r in qrows])
    qm /= np.linalg.norm(qm, axis=1, keepdims=True) + 1e-12
    return qids, qm


def _adc_tables(qm: np.ndarray, books: np.ndarray) -> np.ndarray:
    """ADC lookup tables T[q, j, c] = <query_j, codebook_{j,c}> —
    (Q, m, k) doubles, closure-broadcast to the scoring kernel."""
    m_, ds = books.shape[0], books.shape[2]
    return np.stack(
        [qm[:, j * ds : (j + 1) * ds] @ books[j].T for j in range(m_)], axis=1
    )


def _probe_cells(qm: np.ndarray, qids: np.ndarray, cents: np.ndarray, nprobe: int):
    """Per-query probed coarse cells, driver-side (Q x nprobe ints):
    {query_id -> cell set} for the kernel's mask plus the sorted union
    for the partition-prunable scan filter."""
    sims = qm @ cents.T
    probe = np.argsort(-sims, axis=1)[:, :nprobe]
    probed_sets = {int(q): set(map(int, row)) for q, row in zip(qids, probe)}
    all_probed = sorted({c for s in probed_sets.values() for c in s})
    return probed_sets, all_probed


def _adc_score_fn(
    tables: np.ndarray,
    qids: np.ndarray,
    rerank: int,
    probed_sets=None,
    exclude_self: bool = True,
):
    """The ONE ADC scoring kernel every PQ path runs (inline
    ext_knn_pq / ext_knn_ivfpq and the saved-index query path —
    equality between them is pytest-pinned, and a divergent copy here
    would break it silently): per Arrow batch, score = m table
    gathers over the codes, optionally mask rows outside each query's
    probed cells, keep the per-batch top ``rerank`` INCLUDING rows
    tied with the boundary score. Keeping boundary ties makes the
    candidate set invariant to batching: duplicate code rows produce
    exact ADC ties, and an arbitrary per-batch tie cut would let the
    final ranking depend on partition layout — the global
    (score desc, neighbor_id) cut in :func:`_adc_rerank` then selects
    the same rows under ANY partitioning.

    Adversarial bound: the documented batches x Q x rerank emission
    ceiling assumes ties at the kth score are rare. On a corpus of
    heavily duplicated vectors (identical rows -> identical codes ->
    exact ties) EVERY tied row survives the per-batch cut, so the
    emission can degrade toward batches x Q x (rerank + tie-class
    size). That is the price of batching invariance; callers who can
    tolerate layout-dependent tie resolution can deduplicate exact
    code rows upstream (group identical codes, fan back out after
    the cut) — the global cut in _adc_rerank re-bounds the final
    candidate set either way."""
    m_ = tables.shape[1]

    def score(batches):
        for pdf in batches:
            if not len(pdf):  # empty Arrow batch: np.stack would raise
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # (B, m)
            vids = pdf["vec_id"].to_numpy()
            acc = np.zeros((len(qids), len(codes)))
            for j in range(m_):
                acc += tables[:, j, codes[:, j]]
            # self-matches are masked HERE, not filtered downstream: a
            # self row surviving to the per-batch cut would consume a
            # top-``rerank`` slot and push the true boundary candidate
            # out in large batches only — breaking batching invariance.
            # Only valid under the shared-id-namespace contract (see
            # query_pq_index); external-namespace callers disable it.
            if exclude_self:
                acc[qids[:, None] == vids[None, :]] = -np.inf
            if probed_sets is not None:
                cells = pdf["cell"].to_numpy()
                for qi, q in enumerate(qids):
                    mask = np.array(
                        [c not in probed_sets[int(q)] for c in cells]
                    )
                    acc[qi, mask] = -np.inf
            top = min(rerank, len(codes))
            kth = -np.partition(-acc, top - 1, axis=1)[:, top - 1]
            keep = np.isfinite(acc) & (acc >= kth[:, None])
            qidx, vidx = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "query_id": qids[qidx],
                    "neighbor_id": vids[vidx],
                    "pq_score": acc[qidx, vidx],
                }
            )

    return score


def _adc_rerank(cand: DataFrame, vectors: DataFrame, q: DataFrame, rerank: int) -> DataFrame:
    """Shared exact-re-rank tail of every PQ path: global per-query
    top-R cut on the ADC score, join the (tiny) survivor set back to
    full vectors, exact cosine top-k."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_score").desc(), F.col("neighbor_id")
    )
    top_cand = (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= rerank)
        .select("query_id", "neighbor_id")
    )
    full = (
        top_cand.join(vectors, top_cand.neighbor_id == vectors.vec_id)
        .join(F.broadcast(q), "query_id")
        .select("query_id", "q_emb", "neighbor_id", "emb")
    )
    return _exact_topk(full)


@ext_query("ext_knn_pq")  # recall-tested in pytest against brute force
def ext_knn_pq(spark, sf_dir):
    """PQ ANN with asymmetric distance computation (ADC) + exact
    re-rank: queries build per-subspace inner-product tables against
    the codebooks (Q x m x k doubles, closure-broadcast); scoring a
    corpus vector is m table gathers over its codes — no float vector
    is touched until the top ``_PQ_RERANK`` ADC candidates per query
    are re-scored exactly. 100 TB shape: the scan side reads only
    (vec_id, codes) — m bytes of payload per row; the per-batch
    top-R cut bounds the shuffle to batches x Q x R rows; the exact
    re-score joins the (tiny) candidate set back to the full vectors.
    Approximation error costs candidate quality only, never false
    positives (the re-rank is exact — same contract as LSH/IVF)."""
    e = _emb(spark, sf_dir)
    books = _pq_codebooks(e)
    enc = _pq_encode_udf(books)
    codes_df = e.select("vec_id", enc(F.col("emb")).alias("codes"))

    qids, qm = _query_matrix(e.filter(F.col("vec_id") < N_QUERIES))
    tables = _adc_tables(qm, books)
    cand = codes_df.mapInPandas(
        _adc_score_fn(tables, qids, _PQ_RERANK),
        "query_id long, neighbor_id long, pq_score double",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    return _adc_rerank(cand, e, q, _PQ_RERANK)


@ext_query("ext_knn_ivfpq")  # recall-tested in pytest against brute force
def ext_knn_ivfpq(spark, sf_dir):
    """IVF+PQ (IVFADC — the FAISS production architecture): coarse
    cells bound WHICH rows are scored, PQ codes bound the BYTES each
    scoring touches. The corpus carries (cell, codes) — m bytes of
    scoring payload per row behind a partition-prunable cell key; a
    query ADC-scores only its nprobe probed cells (~nprobe/k of the
    corpus) via table gathers, and only the surviving top-R
    candidates per query are re-scored exactly against full vectors.
    At 100 TB: cells partition the index on disk (see
    build_ivf_index), codes keep the scanned fraction in memory, and
    neither the scan nor the shuffle ever carries a float vector —
    candidate quality is the only thing approximation can cost."""
    e = _emb(spark, sf_dir)
    cents = _ivf_centroids(e)
    books = _pq_codebooks(e)
    enc = _pq_encode_udf(books)
    keyed = _ivf_keyed(e, cents).select(
        "vec_id", "cell", enc(F.col("emb")).alias("codes")
    )

    qids, qm = _query_matrix(e.filter(F.col("vec_id") < N_QUERIES))
    tables = _adc_tables(qm, books)
    probed_sets, all_probed = _probe_cells(qm, qids, cents, _IVF_NPROBE)
    cand = (
        keyed.filter(F.col("cell").isin(all_probed))
        .mapInPandas(
            _adc_score_fn(tables, qids, _PQ_RERANK, probed_sets),
            "query_id long, neighbor_id long, pq_score double",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    return _adc_rerank(cand, e, q, _PQ_RERANK)


# ------------------------------------------------ persisted PQ / IVFPQ index

def _pq_recon_sims(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Per-row cosine between a (normalized) vector and its PQ
    reconstruction — the codebook-fit metric: high when the codebooks
    were trained on this distribution, falling when the data drifts
    away from them. Vectorized numpy (n x k matmul per subspace)."""
    m_, ds = books.shape[0], books.shape[2]
    recon = np.empty_like(x)
    for j in range(m_):
        sub = x[:, j * ds : (j + 1) * ds]
        d2 = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(axis=1)
        recon[:, j * ds : (j + 1) * ds] = books[j][d2.argmin(axis=1)]
    return (x * recon).sum(axis=1) / (np.linalg.norm(recon, axis=1) + 1e-12)


def _pq_encode_sim_udf(books: np.ndarray):
    """Codes + reconstruction cosine in one Arrow pass — the append
    path needs both (codes route the row into the index; the sim
    feeds the codebook-drift report)."""
    m_, ds = books.shape[0], books.shape[2]

    @F.pandas_udf("struct<codes:array<int>, sim:double>")
    def enc(emb: pd.Series) -> pd.DataFrame:
        x = np.stack(emb.to_numpy())
        x = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
        codes = np.empty((len(x), m_), dtype="int64")
        for j in range(m_):
            sub = x[:, j * ds : (j + 1) * ds]
            d2 = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(axis=1)
            codes[:, j] = d2.argmin(axis=1)
        return pd.DataFrame(
            {"codes": list(codes), "sim": _pq_recon_sims(x, books)}
        )

    return enc


def build_pq_index(e: DataFrame, path: str, with_cells: bool = False) -> dict:
    """Materialize the PQ index the inline queries recompute: the
    encoded corpus (vec_id, codes — m bytes of scoring payload per
    row) written once, plus the trained codebooks as
    ``_codebooks.json`` in the index root. ``with_cells=True`` builds
    the composed IVFPQ layout instead (the FAISS IVFADC architecture):
    rows additionally carry their nearest coarse centroid and the
    parquet is PARTITIONED BY cell (with ``_centroids.json``), so a
    query batch's scan opens only its probed cell directories.

    This is the write-once form of the PQ 100 TB contract, mirroring
    :func:`build_ivf_index`: codebooks (and centroids) train on a
    constant-size deterministic sample, the corpus is encoded in one
    linear pass, and every later query reads m-byte codes instead of
    float vectors. ``_pq_fit.json`` records the training sample's mean
    reconstruction cosine — the fit reference the append path's drift
    report compares against. Returns the recorded fit stats."""
    import json
    import os

    books = _pq_codebooks(e)
    enc = _pq_encode_udf(books)
    if with_cells:
        cents = _ivf_centroids(e)
        _ivf_keyed(e, cents).select(
            "vec_id", "cell", enc(F.col("emb")).alias("codes")
        ).write.mode("overwrite").partitionBy("cell").parquet(path)
    else:
        e.select("vec_id", enc(F.col("emb")).alias("codes")).write.mode(
            "overwrite"
        ).parquet(path)
    # fit reference on a HELD-OUT deterministic stride (disjoint from
    # the % 7 == 0 training sample): k-means with k near the sample
    # size memorizes training points (recon sim -> 1.0 at small
    # corpora), so the training sample itself would set an
    # unreachable reference and flag every in-distribution append as
    # drift. The held-out slice measures generalization fit — what an
    # append batch from the same distribution should actually score.
    sample = (
        e.filter(F.col("vec_id") % 7 == 1)
        .orderBy("vec_id")
        .limit(_IVF_SAMPLE_CAP)
        .select("emb")
        .collect()
    )
    m = np.array([r["emb"] for r in sample], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True) + 1e-12
    stats = {"mean_recon_sim": float(_pq_recon_sims(m, books).mean())}
    with open(os.path.join(path, "_codebooks.json"), "w") as fh:
        json.dump(books.tolist(), fh)
    if with_cells:
        with open(os.path.join(path, "_centroids.json"), "w") as fh:
            json.dump(cents.tolist(), fh)
    with open(os.path.join(path, "_pq_fit.json"), "w") as fh:
        json.dump(stats, fh)
    return stats


def append_to_pq_index(
    spark,
    path: str,
    new_vectors: DataFrame,
    fit_drop_threshold: float = 0.05,
    concentration_factor: float = 4.0,
) -> dict:
    """Incremental PQ maintenance, mirroring :func:`append_to_ivf_index`:
    new vectors are encoded with the SAVED codebooks (existing codes
    stay valid — readers see one quantizer throughout) and appended;
    the codebooks move never. The price of never retraining is
    codebook drift, so the append returns a drift report:
    ``mean_recon_sim`` is the batch's mean cosine to its own PQ
    reconstruction, compared against the build-time fit reference
    (``fit_drop = build - batch``); on an IVFPQ layout the coarse
    concentration signal fires too (hottest cell >
    ``concentration_factor`` x uniform share). Either trips
    ``retrain_recommended`` — the signal for a new build, not a
    mutation."""
    import json
    import os

    with open(os.path.join(path, "_codebooks.json")) as fh:
        books = np.array(json.load(fh))
    with open(os.path.join(path, "_pq_fit.json")) as fh:
        fit = json.load(fh)
    cents_path = os.path.join(path, "_centroids.json")
    has_cells = os.path.exists(cents_path)
    enc = _pq_encode_sim_udf(books)
    assigned = new_vectors.select(
        "vec_id", "emb", enc(F.col("emb")).alias("p")
    ).select(
        "vec_id", "emb", F.col("p.codes").alias("codes"), F.col("p.sim").alias("sim")
    )
    if has_cells:
        with open(cents_path) as fh:
            cents = np.array(json.load(fh))
        cell = _ivf_assign_udf(cents)
        assigned = assigned.withColumn("cell", cell(F.col("emb")).getField("cell"))
    assigned = assigned.persist()
    if has_cells:
        stats = assigned.groupBy("cell").agg(
            F.count("*").alias("n"), F.sum("sim").alias("s")
        ).collect()
        n = sum(r["n"] for r in stats)
        assigned.select("vec_id", "cell", "codes").write.mode("append").partitionBy(
            "cell"
        ).parquet(path)
    else:
        stats = assigned.agg(
            F.count("*").alias("n"), F.sum("sim").alias("s")
        ).collect()
        n = stats[0]["n"]
        assigned.select("vec_id", "codes").write.mode("append").parquet(path)
    assigned.unpersist()
    mean_sim = (sum(r["s"] for r in stats) / n) if n else None
    fit_drop = (fit["mean_recon_sim"] - mean_sim) if n else 0.0
    max_frac = (
        (max(r["n"] for r in stats) / n) if (has_cells and n) else None
    )
    concentrated = (
        has_cells and n and max_frac > concentration_factor / len(cents)
    )
    return {
        "appended": n,
        "mean_recon_sim": mean_sim,
        "build_recon_sim": fit["mean_recon_sim"],
        "fit_drop": fit_drop,
        "cells_touched": len(stats) if has_cells else None,
        "max_cell_frac": max_frac,
        "retrain_recommended": bool(fit_drop > fit_drop_threshold or concentrated),
    }


def query_pq_index(
    spark,
    path: str,
    queries: DataFrame,
    vectors: DataFrame | None = None,
    rerank: int = _PQ_RERANK,
    nprobe: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """ANN top-k against a saved :func:`build_pq_index` layout.
    ``queries`` carries (query_id, q_emb) — a bounded batch, collected
    driver-side to build the ADC tables (same contract as the inline
    paths). On an IVFPQ layout the probed cell ids become an IN-filter
    on the index's PARTITION column (scan opens only probed cell
    directories). ``vectors`` (vec_id, emb) enables the exact re-rank
    tail — the full-fidelity contract, identical to the inline
    queries; without it the ADC ranking itself is returned (rank by
    approximate score), the codes-only deployment where float vectors
    are too large to keep online.

    ``exclude_self=True`` (the default, matching the inline keys)
    assumes query_id SHARES the corpus vec_id namespace: the kernel
    masks exact-id matches and the plan filters
    query_id != neighbor_id. Callers whose query batch carries an
    EXTERNAL id namespace must pass ``exclude_self=False`` — otherwise
    a query id coincidentally colliding with an unrelated corpus
    vec_id silently loses that neighbor."""
    import json
    import os

    with open(os.path.join(path, "_codebooks.json")) as fh:
        books = np.array(json.load(fh))
    qids, qm = _query_matrix(queries, "query_id", "q_emb")
    tables = _adc_tables(qm, books)
    idx = spark.read.parquet(path)
    probed_sets = None
    cents_path = os.path.join(path, "_centroids.json")
    if os.path.exists(cents_path):
        with open(cents_path) as fh:
            cents = np.array(json.load(fh))
        probed_sets, all_probed = _probe_cells(
            qm, qids, cents, nprobe if nprobe is not None else _IVF_NPROBE
        )
        idx = idx.filter(F.col("cell").isin(all_probed))
    cand = idx.mapInPandas(
        _adc_score_fn(tables, qids, rerank, probed_sets, exclude_self),
        "query_id long, neighbor_id long, pq_score double",
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    if vectors is None:
        w = Window.partitionBy("query_id").orderBy(
            F.col("pq_score").desc(), F.col("neighbor_id")
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= K_NEIGHBORS)
            .select(
                "query_id",
                "neighbor_id",
                "rank",
                round4(F.col("pq_score")).alias("score"),
            )
        )
    q = queries.select("query_id", "q_emb")
    return _adc_rerank(cand, vectors, q, rerank)


RRF_K = 60
HYBRID_POOL = 50  # depth of each ranker's candidate list
HYBRID_TOPK = 20


@ext_query(
    "ext_hybrid_search",
    f"""WITH words AS (
          SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
          FROM documents WHERE doc_id <> 0),
        tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
        stats AS (SELECT AVG(dl * 1.0) AS avgdl, COUNT(*) AS n FROM dl),
        dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM words
                  WHERE w IN ('spark', 'table', 'merge') GROUP BY w),
        s AS (
          SELECT tf.doc_id,
                 ln((n - df + 0.5) / (df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS sc,
                 tf.w
          FROM tf JOIN dfreq ON tf.w = dfreq.w
          JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
        lex0 AS (
          SELECT doc_id,
                 COALESCE(SUM(CASE WHEN w = 'spark' THEN sc END), 0.0)
                 + COALESCE(SUM(CASE WHEN w = 'table' THEN sc END), 0.0)
                 + COALESCE(SUM(CASE WHEN w = 'merge' THEN sc END), 0.0) AS bm25
          FROM s GROUP BY doc_id),
        lex AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY FLOOR(bm25 * 10000.0 + 0.5) / 10000.0 DESC,
                                    doc_id) AS r_lex
          FROM lex0),
        qv AS (SELECT embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id = 0),
        vec0 AS (
          SELECT c.vec_id,
                 FLOOR(list_cosine_similarity(qv.emb, c.embedding::DOUBLE[]) * 10000.0 + 0.5)
                   / 10000.0 AS cos
          FROM embeddings c, qv WHERE c.vec_id <> 0),
        vec AS (
          SELECT vec_id,
                 ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS r_vec
          FROM vec0),
        fused AS (
          SELECT COALESCE(l.doc_id, v.vec_id) AS doc_id, l.r_lex, v.r_vec,
                 COALESCE(1.0 / ({RRF_K} + l.r_lex), 0.0)
                 + COALESCE(1.0 / ({RRF_K} + v.r_vec), 0.0) AS rrf
          FROM (SELECT * FROM lex WHERE r_lex <= {HYBRID_POOL}) l
          FULL OUTER JOIN (SELECT * FROM vec WHERE r_vec <= {HYBRID_POOL}) v
            ON l.doc_id = v.vec_id)
        SELECT doc_id, r_lex, r_vec,
               FLOOR(rrf * 1000000.0 + 0.5) / 1000000.0 AS rrf
        FROM fused
        ORDER BY rrf DESC, doc_id LIMIT {HYBRID_TOPK}""",
)
def ext_hybrid_search(spark, sf_dir):
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    ranker and the cosine vector ranker (rrf = Σ 1/(60+rank) over the
    rankers that surfaced the doc) — the standard RAG retrieval stack
    expressed as one plan. Scale shape: each ranker reduces to a
    SMALL top-N candidate list via distributed partial top-k
    (TakeOrderedAndProject), ranks are assigned on the 50-row
    survivor frame, the fusion is a full-outer join of two 50-row frames —
    negligible against the scans — and every corpus-sized structure
    (postings, embeddings) is touched exactly once by its own ranker.
    Ranks are computed over 4-decimal-rounded scores with id
    tiebreaks (the knn recipe), so rank assignment is bit-identical
    in both engines; the query is doc/vec 0 (text terms + its
    embedding), excluded from both candidate pools."""
    from smartpipeline_spark.functions.text import bm25_scores

    d = sources.table(spark, "documents", sf_dir).filter(F.col("doc_id") != 0)
    lex_scored = bm25_scores(d).select(
        "doc_id",
        (F.floor(F.col("raw") * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias("bm25"),
    )
    # top-POOL FIRST via orderBy().limit() — TakeOrderedAndProject, a
    # distributed partial top-k — then rank the 50-row survivor frame.
    # A global row_number over the corpus-sized score frame would drag
    # everything into ONE partition (WindowExec warns exactly that).
    w_lex = Window.orderBy(F.col("bm25").desc(), F.asc("doc_id"))
    lex = (
        lex_scored.orderBy(F.col("bm25").desc(), F.asc("doc_id"))
        .limit(HYBRID_POOL)
        .withColumn("r_lex", F.row_number().over(w_lex))
        .select("doc_id", "r_lex")
    )

    e = _emb(spark, sf_dir)
    # the query vector attaches as a keyless 1-row AGGREGATE (not a
    # filtered frame): semantically identical (exactly one row has
    # vec_id 0), but the plan then carries a scalar frame the BNLJ
    # gate can account for — a bare 1-row filter broadcast is
    # indistinguishable from an accidental all-pairs join in plan text
    q = (
        e.filter(F.col("vec_id") == 0)
        .agg(F.first("emb").alias("q_emb"))
    )
    c = e.filter(F.col("vec_id") != 0)
    vec_scored = c.crossJoin(F.broadcast(q)).select(
        "vec_id", round4(cosine_expr(F.col("q_emb"), F.col("emb"))).alias("cos")
    )
    w_vec = Window.orderBy(F.col("cos").desc(), F.asc("vec_id"))
    vec = (
        vec_scored.orderBy(F.col("cos").desc(), F.asc("vec_id"))
        .limit(HYBRID_POOL)
        .withColumn("r_vec", F.row_number().over(w_vec))
        .select("vec_id", "r_vec")
    )

    fused = lex.join(vec, lex.doc_id == vec.vec_id, "full_outer").select(
        F.coalesce("doc_id", "vec_id").alias("doc_id"),
        "r_lex",
        "r_vec",
        (
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_vec")), F.lit(0.0))
        ).alias("rrf_raw"),
    )
    return (
        fused.orderBy(F.col("rrf_raw").desc(), F.asc("doc_id"))
        .limit(HYBRID_TOPK)
        .select(
            "doc_id",
            "r_lex",
            "r_vec",
            (F.floor(F.col("rrf_raw") * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)).alias("rrf"),
        )
    )


@ext_query("ext_dedup_semantic")  # recall-tested vs the brute baseline
def ext_dedup_semantic(spark, sf_dir):
    """SemDeDup-shaped semantic dedup AT SCALE: coarse-quantize every
    embedding into its 2 nearest k-means cells (the same sample-
    trained quantizer as ext_knn_ivf), then compare pairs only WITHIN
    a cell — corpus² collapses to Σ cell². The 2-cell assignment
    catches boundary pairs a 1-cell partition would split (a pair is
    compared if ANY cell is shared; distinct() removes the doubles).
    This is the composition the brute ext_dedup_embedding oracles:
    brute is O(N²) and dies at 10⁸ vectors; cells keep the same
    plan shape (equi-join on cell, JVM cosine filter) at any N.
    Recall vs brute is pytest-measured (boundary losses only)."""
    e = _emb(spark, sf_dir)
    from smartpipeline_spark.functions.dedup import COSINE_DUP_THRESHOLD

    cents = _ivf_centroids(e)
    cells = _ivf_cells_udf(cents, nprobe=2)
    binned = e.select(
        "vec_id", "emb", F.explode(cells(F.col("emb"))).alias("cell")
    )
    a, b = binned.alias("a"), binned.alias("b")
    cos = cosine_expr(F.col("a.emb"), F.col("b.emb"))
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            cos.alias("_cos"),
        )
        .filter(F.col("_cos") >= COSINE_DUP_THRESHOLD)
        .select(
            "v1",
            "v2",
            round4(F.col("_cos")).alias("cosine"),
        )
        .distinct()
    )


# ------------------------------------------------- per-partition HNSW

_HNSW_M = 8  # max neighbors per node above level 0 (2M at level 0)
_HNSW_EF_CONSTRUCTION = 64
_HNSW_EF_SEARCH = 48


def _hnsw_build(vecs: "np.ndarray", m: int = _HNSW_M, ef: int = _HNSW_EF_CONSTRUCTION, seed: int = 0):
    """Hierarchical Navigable Small World graph over L2-normalized
    row vectors (Malkov & Yashunin 2016, public algorithm): nodes get
    geometric levels, each inserted by greedy-descending from the top
    entry point, then ef-searching and linking the best ``m``
    neighbors per level (2m at level 0), pruning back-links to the
    cap. Pure numpy, similarity = dot (vectors pre-normalized).

    Returns (levels, adjacency, entry_point, max_level) where
    adjacency[level][node] -> list of neighbor ids (local indices)."""
    import math

    rng = np.random.default_rng(seed)
    n = vecs.shape[0]
    ml = 1.0 / math.log(m)
    levels = np.minimum(
        (-np.log(rng.random(n)) * ml).astype(np.int64), 32
    )
    adj: list[dict[int, list[int]]] = [dict() for _ in range(int(levels.max()) + 1)]
    entry, max_level = 0, int(levels[0])

    def select_diverse(tgt, cand, cap):
        """Malkov Algorithm 4 (select-neighbors heuristic): walk the
        candidates best-first and keep e only if it is closer to the
        target than to every already-kept neighbor — this is what
        preserves BRIDGES between clusters (a plain top-cap keeps an
        intra-cluster clique and greedy search can never cross),
        then backfill remaining slots with the best pruned ones."""
        # round-9 perf: ONE pairwise gemm over the candidate set
        # (c x c, c <= ef) replaces up to cap scalar numpy dots per
        # candidate; .tolist() makes the inner comparisons pure-python
        # floats (identical float64 values, identical selections)
        ids = [e for _x, e in cand]
        pair = (vecs[ids] @ vecs[ids].T).tolist() if ids else []
        selected: list[int] = []
        for j, (sim, _e) in enumerate(cand):
            if len(selected) == cap:
                break
            row = pair[j]
            if all(row[k] <= sim for k in selected):
                selected.append(j)
        if len(selected) < cap:
            chosen = {cand[j][1] for j in selected}
            for j, (_sim, e) in enumerate(cand):
                if len(selected) == cap:
                    break
                if e not in chosen:
                    selected.append(j)
                    chosen.add(e)
        return [cand[j][1] for j in selected]

    def search_layer(q, eps, ef_cap, level):
        # heap-based rewrite of the canonical ef-search (round-9 perf:
        # the original re-sorted the whole frontier per pop and
        # re-scanned best for its min per insert — O(ef) each — and
        # did one scalar dot per neighbor; this does O(log ef) heap
        # ops and ONE batched gemv per node expansion, with identical
        # traversal order incl. ties: cand keys (-sim, -node) pop the
        # largest node among equal sims, exactly like the old
        # sort(reverse=True) pop, and best is a min-heap of
        # (sim, node) whose root is the old min(best)).
        import heapq

        gr = adj[level]
        visited = set(eps)
        best = [(float(vecs[e] @ q), e) for e in eps]
        cand = [(-s, -e) for s, e in best]
        heapq.heapify(best)
        heapq.heapify(cand)
        while cand:
            nsim, nnode = heapq.heappop(cand)
            sim, node = -nsim, -nnode
            if len(best) >= ef_cap and sim < best[0][0]:
                break
            nbs = [nb for nb in gr.get(node, ()) if nb not in visited]
            if not nbs:
                continue
            visited.update(nbs)
            sims = vecs[nbs] @ q
            for s, nb in zip(sims, nbs):
                s = float(s)
                if len(best) < ef_cap:
                    heapq.heappush(best, (s, nb))
                    heapq.heappush(cand, (-s, -nb))
                elif s > best[0][0]:
                    heapq.heapreplace(best, (s, nb))
                    heapq.heappush(cand, (-s, -nb))
        return sorted(best, reverse=True)

    for i in range(1, n):
        li = int(levels[i])
        q = vecs[i]
        ep = [entry]
        for level in range(max_level, li, -1):
            ep = [search_layer(q, ep, 1, level)[0][1]]
        for level in range(min(li, max_level), -1, -1):
            found = search_layer(q, ep, ef, level)
            cap = m if level > 0 else 2 * m
            neigh = select_diverse(i, found, cap)
            adj[level][i] = neigh
            for nb in neigh:
                back = adj[level].setdefault(nb, [])
                back.append(i)
                if len(back) > cap:
                    sims = vecs[back] @ vecs[nb]
                    cand = sorted(
                        ((float(sims[j]), back[j]) for j in range(len(back))),
                        reverse=True,
                    )
                    adj[level][nb] = select_diverse(nb, cand, cap)
            ep = [node for _s, node in found] or ep
        if li > max_level:
            max_level, entry = li, i
    return levels, adj, entry, max_level


def _hnsw_search(vecs, adj, entry, max_level, q, k, ef=_HNSW_EF_SEARCH):
    """Top-k (similarity, local_id) for one normalized query vector."""
    def search_layer(qv, eps, ef_cap, level):
        # same heap/batched-gemv form as the build-side search_layer
        # (round-9 perf), identical traversal order incl. ties
        import heapq

        gr = adj[level]
        visited = set(eps)
        best = [(float(vecs[e] @ qv), e) for e in eps]
        cand = [(-s, -e) for s, e in best]
        heapq.heapify(best)
        heapq.heapify(cand)
        while cand:
            nsim, nnode = heapq.heappop(cand)
            sim, node = -nsim, -nnode
            if len(best) >= ef_cap and sim < best[0][0]:
                break
            nbs = [nb for nb in gr.get(node, ()) if nb not in visited]
            if not nbs:
                continue
            visited.update(nbs)
            sims = vecs[nbs] @ qv
            for s, nb in zip(sims, nbs):
                s = float(s)
                if len(best) < ef_cap:
                    heapq.heappush(best, (s, nb))
                    heapq.heappush(cand, (-s, -nb))
                elif s > best[0][0]:
                    heapq.heapreplace(best, (s, nb))
                    heapq.heappush(cand, (-s, -nb))
        return sorted(best, reverse=True)

    ep = [entry]
    for level in range(max_level, 0, -1):
        ep = [search_layer(q, ep, 1, level)[0][1]]
    found = search_layer(q, ep, max(ef, k), 0)
    return found[:k]


@ext_query("ext_knn_hnsw", _KNN_TOPK_ORACLE)
def ext_knn_hnsw(spark, sf_dir):
    """Graph-ANN member of the index family: sharded HNSW.
    A graph index is insert-sequential, so the Spark-idiomatic layout
    is one graph PER SHARD (pmod(vec_id) — deterministic membership,
    independent of physical partitioning): each task builds an
    in-memory graph over its shard group and answers the broadcast
    query batch locally; per-shard top-k candidates union and the
    family's shared exact re-score tail picks the global top-k
    (false candidates cost recall nothing — same contract as
    IVF/PQ/LSH). build_hnsw_index persists the SAME shard layout, so
    saved-vs-inline equality is structural (pinned in pytest like the
    IVF/PQ saved indexes).

    100 TB design: graphs never leave their task, candidates are
    nshards x k rows per query — the only shuffle is the shard
    groupBy + candidate join-back. Graph build is O(shard·ef·log n)
    ONCE per shard and amortizes across query batches (or once EVER
    via the persisted layout); shards are independent, so the
    structure scales out by shard count, exactly like the
    coarse-cell indexes. The kernel sorts its shard by vec_id and
    seeds level draws from the shard's min id, so the graph (and the
    candidate set) is deterministic under any row arrival order.

    Oracled as of round 9 with the exact brute-force ranking
    (``_KNN_TOPK_ORACLE``): determinism + the fixture-scale shard/ef
    geometry make the candidate union contain the true top-k for
    every query (verified bit-exact, rounded scores included, at
    sf0.001/0.01/0.1) — so the driver grades graph search end-to-end
    and any recall regression turns the row red. The graph-structural
    properties (local search ≡ exhaustive, saved ≡ inline, append
    lifecycle) stay pinned by the four HNSW pytests."""
    import pandas as pd

    e = _emb(spark, sf_dir)
    q_rows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "emb")
        .collect()  # bounded BY CONTRACT: the query batch only
    )
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    qm = np.array([r["emb"] for r in q_rows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def kernel(_key, pdf):
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        vecs = np.array(list(pdf["emb"]), dtype=np.float64)
        order = np.argsort(ids)
        ids, vecs = ids[order], vecs[order]
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        nvecs = vecs / norms
        _levels, adj, entry, max_level = _hnsw_build(
            nvecs, seed=int(ids[0])
        )
        out_q, out_n = [], []
        for qi in range(qm.shape[0]):
            # k+1: the query vector itself lives in some shard and is
            # excluded below — without the spare slot that query would
            # surface only k-1 global candidates from its home shard
            found = _hnsw_search(
                nvecs, adj, entry, max_level, qm[qi], K_NEIGHBORS + 1
            )
            for _sim, local in found:
                nid = int(ids[local])
                if nid == int(q_ids[qi]):
                    continue  # self-match, excluded like every ANN key
                out_q.append(int(q_ids[qi]))
                out_n.append(nid)
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    # deterministic pmod sharding (not physical partitions): the SAME
    # shard layout the persisted index writes, so the saved-vs-inline
    # equality the family pins for IVF/PQ holds structurally here too
    n_shards = _hnsw_n_shards(e)
    cand_pairs = (
        _spread_groups(_hnsw_sharded(e, n_shards), n_shards, "shard")
        .groupBy("shard")
        .applyInPandas(kernel, "query_id long, neighbor_id long")
    )
    q = spark.createDataFrame(
        [(int(i),) for i in q_ids], "query_id long"
    ).join(
        e.select(F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")),
        "query_id",
    )
    cands = (
        cand_pairs.join(
            e.select(F.col("vec_id").alias("neighbor_id"), "emb"), "neighbor_id"
        )
        .join(F.broadcast(q), "query_id")
    )
    return _exact_topk(cands)


# -------------------------------------------- persisted HNSW index

_HNSW_SHARD_TARGET = 500  # ~vectors per shard graph

_HNSW_GRAPH_SCHEMA = (
    "shard int, ids array<long>, vecs array<array<double>>, "
    "entry int, max_level int, adj array<array<array<int>>>"
)


def _hnsw_shard_kernel(key, pdf):
    """groupBy('shard').applyInPandas kernel: build one graph per
    shard and serialize it as ONE ROW (ids, normalized vectors,
    entry point, per-level adjacency as nested arrays)."""
    import pandas as pd

    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    vecs = np.array(list(pdf["emb"]), dtype=np.float64)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    nvecs = vecs / norms
    _levels, adj, entry, max_level = _hnsw_build(nvecs, seed=int(ids[0]))
    n = len(ids)
    adj_ser = [
        [list(map(int, level.get(i, []))) for i in range(n)] for level in adj
    ]
    return pd.DataFrame(
        {
            "shard": [int(key[0])],
            "ids": [ids.tolist()],
            "vecs": [nvecs.tolist()],
            "entry": [int(entry)],
            "max_level": [int(max_level)],
            "adj": [adj_ser],
        }
    )


def _hnsw_sharded(e: DataFrame, n_shards: int, base: int = 0) -> DataFrame:
    """Deterministic shard assignment: pmod(vec_id) — independent of
    physical partitioning, so saved and inline layouts agree exactly
    and an appended batch lands in its own disjoint shard-id range."""
    return e.select(
        "vec_id",
        "emb",
        (F.pmod(F.col("vec_id"), F.lit(n_shards)) + F.lit(base)).cast("int").alias("shard"),
    )


def _hnsw_n_shards(e: DataFrame) -> int:
    return max(1, e.count() // _HNSW_SHARD_TARGET)


def build_hnsw_index(e: DataFrame, path: str) -> None:
    """Materialize the sharded-HNSW layout: ``path/graphs`` holds one
    row per shard graph (ids + normalized vectors + adjacency —
    self-contained, a query batch never touches the raw corpus),
    ``path/vectors`` the (vec_id, emb) table the exact re-score tail
    joins back to. Write-once: graphs are immutable; growth appends
    NEW shards (append_to_hnsw_index), never mutates built ones —
    the same never-mutate contract as the IVF/PQ indexes."""
    import os

    n_shards = _hnsw_n_shards(e)
    graphs = (
        _spread_groups(_hnsw_sharded(e, n_shards), n_shards, "shard")
        .groupBy("shard")
        .applyInPandas(_hnsw_shard_kernel, _HNSW_GRAPH_SCHEMA)
    )
    graphs.write.mode("overwrite").parquet(os.path.join(path, "graphs"))
    e.select("vec_id", "emb").write.mode("overwrite").parquet(
        os.path.join(path, "vectors")
    )


def append_to_hnsw_index(spark, path: str, new_vectors: DataFrame) -> dict:
    """Incremental growth: the batch becomes its own disjoint shard-id
    range (graphs are insert-sequential, so cross-batch merging would
    mean a rebuild — new shards preserve the write-once contract; a
    compaction that rebuilds many small shards into fewer large ones
    is the maintenance move, same as parquet small-file compaction).
    Returns {"new_shards": n, "n_appended": rows}."""
    import os

    graphs_path = os.path.join(path, "graphs")
    base = (
        spark.read.parquet(graphs_path)
        .agg(F.max("shard").alias("m"))
        .collect()[0]["m"]
        + 1
    )
    n_shards = _hnsw_n_shards(new_vectors)
    n_rows = new_vectors.count()
    graphs = (
        _spread_groups(
            _hnsw_sharded(new_vectors, n_shards, base=base), n_shards, "shard"
        )
        .groupBy("shard")
        .applyInPandas(_hnsw_shard_kernel, _HNSW_GRAPH_SCHEMA)
    )
    graphs.write.mode("append").parquet(graphs_path)
    new_vectors.select("vec_id", "emb").write.mode("append").parquet(
        os.path.join(path, "vectors")
    )
    return {"new_shards": n_shards, "n_appended": n_rows}


def query_hnsw_index(spark, path: str, q: DataFrame, k: int = K_NEIGHBORS) -> DataFrame:
    """Query the saved layout: each graph row searches the broadcast
    query batch locally (one kernel call per shard — no graph ever
    crosses an executor boundary), candidates join back to
    ``path/vectors`` for the family's shared exact re-score top-k.
    ``q``: (query_id, q_emb) — the query batch, bounded by contract."""
    import os

    import pandas as pd

    q_rows = q.collect()  # bounded BY CONTRACT: the query batch only
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    qm = np.array([r["q_emb"] for r in q_rows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def kernel(batches):
        for pdf in batches:
            out_q, out_n = [], []
            for _i, row in pdf.iterrows():
                ids = np.array(row["ids"], dtype=np.int64)
                nvecs = np.array(list(row["vecs"]), dtype=np.float64)
                adj = [
                    {i: list(nb) for i, nb in enumerate(level) if len(nb)}
                    for level in row["adj"]
                ]
                entry, max_level = int(row["entry"]), int(row["max_level"])
                for qi in range(qm.shape[0]):
                    found = _hnsw_search(
                        nvecs, adj, entry, max_level, qm[qi], k + 1
                    )
                    for _sim, local in found:
                        nid = int(ids[local])
                        if nid == int(q_ids[qi]):
                            continue
                        out_q.append(int(q_ids[qi]))
                        out_n.append(nid)
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    graphs = spark.read.parquet(os.path.join(path, "graphs"))
    cand_pairs = graphs.mapInPandas(kernel, "query_id long, neighbor_id long")
    vectors = spark.read.parquet(os.path.join(path, "vectors"))
    qdf = q.select("query_id", F.col("q_emb").cast("array<double>").alias("q_emb"))
    cands = cand_pairs.join(
        vectors.select(F.col("vec_id").alias("neighbor_id"), "emb"),
        "neighbor_id",
    ).join(F.broadcast(qdf), "query_id")
    from pyspark.sql.window import Window

    scored = cands.select(
        "query_id",
        "neighbor_id",
        round4(cosine_expr(F.col("q_emb"), F.col("emb"))).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


# ------------------------------------------- int8 embedding quantization

def quantize_embeddings_int8(vectors: DataFrame, emb_col: str = "emb") -> DataFrame:
    """Per-vector min/max int8 quantization — the embedding-compression
    stage that precedes index build at scale (4x memory cut before
    IVF/PQ/HNSW shards ever materialize a float matrix): code_i =
    round((x_i - min) / scale) with scale = (max - min)/255, plus the
    reconstruction audit columns a pipeline needs to decide whether
    lossy storage is safe (max absolute reconstruction error and a
    deterministic md5 checksum of the code stream for cross-snapshot
    integrity checks).

    Scale shape: row-local expression tree — one pass, zero shuffles,
    whole-stage-codegen'd end to end; nothing leaves the row, so it
    runs at scan speed on 100 TB. Degenerate constant vectors take
    scale=1 so codes are all zero and the error is exactly 0. All
    arithmetic is a fixed double-precision expression tree, so DuckDB
    reproduces every value bit-for-bit (same contract as ext_pmi)."""
    x = F.col(emb_col)
    mn, mx = F.array_min(x), F.array_max(x)
    d = vectors.select(
        "vec_id",
        x.alias("x"),
        mn.alias("mn"),
        mx.alias("mx"),
        F.when(mx > mn, (mx - mn) / F.lit(255.0)).otherwise(F.lit(1.0)).alias("scale"),
    )
    d = d.withColumn(
        "codes",
        F.expr("transform(x, v -> CAST(floor((v - mn) / scale + 0.5d) AS INT))"),
    )
    err = F.array_max(
        F.expr("zip_with(x, codes, (v, c) -> abs(v - (mn + CAST(c AS DOUBLE) * scale)))")
    )
    return d.select(
        "vec_id",
        F.size("x").cast("bigint").alias("n_dims"),
        F.col("mn").alias("v_min"),
        F.col("mx").alias("v_max"),
        F.expr("aggregate(codes, 0L, (a, c) -> a + c)").alias("code_sum"),
        F.md5(F.expr("array_join(transform(codes, c -> CAST(c AS STRING)), ',')")).alias(
            "code_md5"
        ),
        err.alias("max_abs_err"),
    )


@ext_query(
    "ext_emb_quantize",
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
      s AS (SELECT vec_id, x, list_min(x) AS mn, list_max(x) AS mx,
                   CASE WHEN list_max(x) > list_min(x)
                        THEN (list_max(x) - list_min(x)) / 255.0
                        ELSE 1.0 END AS scale
            FROM v),
      c AS (SELECT vec_id, x, mn, mx, scale,
                   list_transform(x, e -> CAST(floor((e - mn) / scale + 0.5) AS INT)) AS codes
            FROM s)
     SELECT vec_id, CAST(len(x) AS BIGINT) AS n_dims, mn AS v_min, mx AS v_max,
            CAST(list_sum(codes) AS BIGINT) AS code_sum,
            md5(array_to_string(list_transform(codes, e -> CAST(e AS VARCHAR)), ',')) AS code_md5,
            list_max(list_transform(range(1, len(x) + 1),
                     i -> abs(x[i] - (mn + codes[i] * scale)))) AS max_abs_err
     FROM c""",
)
def ext_emb_quantize(spark, sf_dir):
    """int8 quantization + reconstruction audit over the embeddings
    table — exact cross-engine: codes, checksums, and every double in
    the audit are fixed expression trees both engines evaluate
    bit-identically."""
    e = sources.table(spark, "embeddings", sf_dir)
    return quantize_embeddings_int8(
        e.select("vec_id", F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("emb"))
    )
