#!/usr/bin/env python
"""Benchmark harness: runs the headline query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec}, "sf": ...}

Each query executes to completion through the `noop` sink (full
computation, no collect/write overhead measured).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: one per operator category + the training-data operators
BENCH_QUERIES = [
    "q01_scan_count",
    "q03_filter_project",
    "q04_join_inner",
    "q05_join_left_agg",
    "q06_join_broadcast",
    "q09_join_3way",
    "q10_join_range",
    "q11_agg_pricing_summary",
    "q12_count_distinct",
    "q13_rollup",
    "q15_window_topk",
    "q16_window_running",
    "q18_orderby_limit",
    "q20_intersect_except",
    "q21_scalar_strings",
    "q22_tumbling_window",
    "q22b_sliding_window",
    "q23_session_window",
    "q24_udf_stage",
    "q24b_udf_chain_throughput",
    "q28_percentiles",
    "ext_dedup_exact",
    "ext_dedup_minhash",
    "ext_fingerprint",
    "ext_knn_bruteforce",
    "ext_knn_lsh",
    "ext_quality_score",
    "ext_tfidf",
    # round-3 additions: the flagship/new operators (bench_compare
    # treats them as added keys; the original 28 stay comparable)
    "q38_tpch_q5",
    "q46_recursive_cte",
    "q60_scd2",
    "ext_hybrid_search",
    "ext_knn_pq",
    "ext_pack_emit",
    "ext_stream_tumbling",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    from smartpipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    registry = entrymod.queries()
    # warm up the JVM / codegen / parquet footer cache / Python workers
    # so the first timed query touching each resource doesn't absorb
    # one-time session costs (steady-state operator cost is the metric;
    # spin-up amortizes to zero over any real workload)
    from smartpipeline_spark import sources

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for tbl in ("lineitem", "orders", "customer", "part", "events",
                "documents", "embeddings"):
        sources.table(spark, tbl, sf_dir).count()
    spark.range(64).mapInPandas(lambda it: it, schema="id long").count()
    # median of N reps per query: single-shot timings on a shared box
    # moved ±40% run-to-run (round-2 finding); the median of 3 is
    # stable enough to make round-over-round diffs meaningful
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = registry[name]
        samples = []
        for _ in range(reps):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.monotonic() - t0)
        timings[name] = round(statistics.median(samples), 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_inventory_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
