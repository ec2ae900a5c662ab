#!/usr/bin/env python
"""Solo probe: build the BM25 postings index over the N-times
replicated documents corpus and dump PER-STAGE task metrics, so the
spilling stage in the build pipeline is identified by name instead of
inferred from app-wide sums (SMOKE_r12 showed 59+14 GB spill constant
across three build variants — meaning the changed phase was never the
spilling one).

Usage: python scripts/bm25_build_probe.py [N] [sf_dir] [--files=K|auto]
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
    n = int(pos[0]) if pos else 8
    sf_dir = pos[1] if len(pos) > 1 else "/root/testdata/sf0.1"
    files = next((a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--files=")), "auto")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g" if n >= 256 else "32g")

    from pyspark.sql import functions as F

    from smartpipeline_spark import sources
    from smartpipeline_spark.functions.text import build_bm25_index
    from smartpipeline_spark.session import default_parallelism, get_spark

    cpus = default_parallelism()
    spark = get_spark(
        "bm25-build-probe",
        shuffle_partitions=max(2 * cpus, 2 * cpus * n // 32),
    )
    docs = sources.table(spark, "documents", sf_dir).select("doc_id", "text")
    docs = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("r"), "doc_id", "text"
    ).select(
        (F.col("doc_id") * n + F.col("r")).alias("doc_id"),
        F.concat("text", F.lit(" rtag"), F.col("r").cast("string")).alias("text"),
    )
    work = tempfile.mkdtemp(prefix="bm25_probe_")
    t0 = time.monotonic()
    stats = build_bm25_index(
        docs, f"{work}/idx", num_files="auto" if files == "auto" else int(files)
    )
    wall = round(time.monotonic() - t0, 2)

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    rows = []
    for s in stages:
        rows.append(
            {
                "stage": s.get("stageId"),
                "name": (s.get("name") or "")[:70],
                "tasks": s.get("numCompleteTasks"),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                "memSpillGB": round(s.get("memoryBytesSpilled", 0) / 2**30, 2),
                "diskSpillGB": round(s.get("diskBytesSpilled", 0) / 2**30, 2),
                "shufWriteGB": round(s.get("shuffleWriteBytes", 0) / 2**30, 2),
                "inGB": round(s.get("inputBytes", 0) / 2**30, 2),
            }
        )
    rows.sort(key=lambda r: -(r["memSpillGB"] + r["diskSpillGB"]))
    print(json.dumps({"wall_s": wall, "n": n, "files_mode": files, "stats": {k: stats[k] for k in ("n_docs", "postings_rows")}, "segments": len(stats["segments"])}))
    for r in rows[:14]:
        print(json.dumps(r))
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
