#!/usr/bin/env python
"""Scale smoke: run the heavy training-data operators on an N-times
replicated near-duplicate corpus (default 8x sf0.1 = 40k docs) — the
WORST case for dedup machinery, since every document has N-1 near
twins and every passage is shared N ways. The point is demonstrated
headroom: candidate generation, span detection, and selection must
complete with flat plans (no collect blowups, no quadratic pair
explosions beyond the declared per-cluster N choose 2) as the corpus
multiplies.

Each replica appends a distinct tag word, so replicas are NEAR dups
(exact dedup correctly finds nothing; MinHash banding and ExactSubstr
spans light up at maximum density).

Usage: python scripts/scale_smoke.py [N] [sf_dir]
Prints one JSON line: {"n_docs": ..., "timings": {...}, "counts": {...}}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from smartpipeline_spark import sources
from smartpipeline_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale-smoke")
    base = sources.table(spark, "documents", sf_dir).select("doc_id", "text")
    docs = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("r"),
        "doc_id",
        "text",
    ).select(
        (F.col("doc_id") * n + F.col("r")).alias("doc_id"),
        F.concat("text", F.lit(" rtag"), F.col("r").cast("string")).alias("text"),
    )
    # materialize once so every operator reads the same physical corpus
    # (and the replicate explode isn't re-run inside each timing)
    docs = docs.repartition(32).persist()
    n_docs = docs.count()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        counts[name] = fn()
        timings[name] = round(time.monotonic() - t0, 2)

    from smartpipeline_spark.functions.dedup import (
        duplicate_spans,
        jaccard_pairs,
        minhash_candidates,
        minhash_signatures,
    )

    timed(
        "exact_dedup_groups",
        lambda: docs.select(
            F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " "))
            .alias("fp")
        )
        .groupBy("fp")
        .count()
        .filter("count >= 2")
        .count(),
    )
    timed(
        "minhash_candidate_pairs",
        lambda: minhash_candidates(minhash_signatures(docs)).count(),
    )
    timed("jaccard_verified_pairs", lambda: jaccard_pairs(docs, threshold=0.8).count())
    timed("exactsubstr_spans", lambda: duplicate_spans(docs).count())

    from smartpipeline_spark.functions.curation import dsir_select

    target = docs.filter(F.col("doc_id") % 97 == 0)
    timed("dsir_selected", lambda: dsir_select(docs, target, frac=0.25).count())

    print(
        json.dumps(
            {"n_docs": n_docs, "replicas": n, "timings": timings, "counts": counts}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
