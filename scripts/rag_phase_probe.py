#!/usr/bin/env python
"""Phase-attributed RAG-rung probe: replicate scale_smoke's
rag_retrieval_qps phases and report each phase's DELTA of app-wide
task metrics (CPU, spill, shuffle), so the 73 GB spill the r12 rung
measured app-wide is attributed to a named phase (the solo BM25 build
probe showed zero spill, so it is NOT the build).

Usage: python scripts/rag_phase_probe.py [N] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import os


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if pos else 256
    sf_dir = pos[1] if len(pos) > 1 else "/root/testdata/sf0.1"
    skip_bm25 = "--skip-bm25" in sys.argv
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g" if n >= 256 else "32g")

    from pyspark.sql import functions as F

    from smartpipeline_spark import sources
    from smartpipeline_spark.functions.similarity import (
        HYBRID_POOL,
        RRF_K,
        build_ivf_index,
        mmr_diversify,
        query_ivf_index,
    )
    from smartpipeline_spark.functions.text import (
        BM25_TERMS,
        build_bm25_index,
        query_bm25_index,
    )
    from smartpipeline_spark.session import default_parallelism, get_spark

    cpus = default_parallelism()
    spark = get_spark(
        "rag-phase-probe", shuffle_partitions=max(2 * cpus, 2 * cpus * n // 32)
    )
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def snap():
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages"
        ) as r:
            st = json.load(r)
        return {
            "cpu_s": sum(s.get("executorCpuTime", 0) for s in st) / 1e9,
            "memSpillGB": sum(s.get("memoryBytesSpilled", 0) for s in st) / 2**30,
            "diskSpillGB": sum(s.get("diskBytesSpilled", 0) for s in st) / 2**30,
            "shufWriteGB": sum(s.get("shuffleWriteBytes", 0) for s in st) / 2**30,
        }

    last = snap()
    t_last = time.monotonic()

    def phase(name):
        nonlocal last, t_last
        cur = snap()
        t = time.monotonic()
        print(
            json.dumps(
                {
                    "phase": name,
                    "wall_s": round(t - t_last, 1),
                    **{k: round(cur[k] - last[k], 2) for k in cur},
                }
            ),
            flush=True,
        )
        last, t_last = cur, t

    n_queries = 32
    emb_base = sources.table(spark, "embeddings", sf_dir)
    emb_n = (
        emb_base.select(
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("r"),
            "vec_id",
            "embedding",
        )
        .select(
            (F.col("vec_id") * n + F.col("r")).alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("emb"),
        )
        .repartition(32)
        .persist()
    )
    emb_n.count()
    phase("emb_replicate_persist")
    rag_docs = (
        sources.table(spark, "documents", sf_dir)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("r"),
            "doc_id",
            "text",
        )
        .select(
            (F.col("doc_id") * n + F.col("r")).alias("doc_id"),
            F.concat("text", F.lit(" rtag"), F.col("r").cast("string")).alias(
                "text"
            ),
        )
    )
    work = tempfile.mkdtemp(prefix="rag_phase_")
    build_ivf_index(emb_n, f"{work}/ivf")
    phase("ivf_build")
    if not skip_bm25:
        build_bm25_index(rag_docs, f"{work}/bm25")
        phase("bm25_build")
    queries_df = (
        emb_base.filter(F.col("vec_id") < n_queries)
        .select(
            (F.col("vec_id") * n).alias("query_id"),
            F.col("embedding").cast("array<double>").alias("q_emb"),
        )
        .localCheckpoint(eager=True)
    )
    phase("query_frame_checkpoint")

    from pyspark.sql import Window

    if skip_bm25:
        lex = spark.range(0).select(
            F.col("id").alias("doc_id"), F.lit(1).alias("r_lex")
        )
    else:
        lex_scored = query_bm25_index(spark, f"{work}/bm25", BM25_TERMS).select(
            "doc_id",
            (F.floor(F.col("raw") * 10000.0 + 0.5) / 10000.0).alias("bm25"),
        )
        w_lex = Window.orderBy(F.col("bm25").desc(), F.asc("doc_id"))
        lex = (
            lex_scored.orderBy(F.col("bm25").desc(), F.asc("doc_id"))
            .limit(HYBRID_POOL)
            .withColumn("r_lex", F.row_number().over(w_lex))
            .select("doc_id", "r_lex")
        )
        lex = lex.localCheckpoint(eager=True)
        phase("lex_leg")
    ann = query_ivf_index(spark, f"{work}/ivf", queries_df)
    w_vec = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.asc("neighbor_id")
    )
    vec = (
        ann.withColumn("r_vec", F.row_number().over(w_vec))
        .filter(F.col("r_vec") <= HYBRID_POOL)
        .select("query_id", F.col("neighbor_id").alias("doc_id"), "r_vec")
    )
    vec = vec.localCheckpoint(eager=True)
    phase("vec_leg")
    fused = (
        vec.join(F.broadcast(lex), "doc_id", "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("r_vec")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("r_lex")), F.lit(0.0)),
        )
        .filter(F.col("query_id").isNotNull())
    )
    pool = fused.join(
        emb_n.withColumnRenamed("vec_id", "doc_id"), "doc_id"
    ).select(
        "query_id",
        F.col("doc_id").alias("neighbor_id"),
        (F.floor(F.col("rrf") * 1000000.0 + 0.5) / 1000000.0).alias("rel"),
        "emb",
    )
    out_n = mmr_diversify(pool).count()
    phase("fuse_mmr")
    print(json.dumps({"mmr_rows": out_n, "n": n}))
    emb_n.unpersist()
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
