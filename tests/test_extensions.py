"""Quality tests for the approximate training-data operators: the
hash-seed-specific paths (MinHash/LSH, SimHash, hyperplane ANN) can't
be SQL-oracled, so they are tested against their exact counterparts
(recall) plus structural invariants."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_minhash_recall_against_exact_jaccard(spark):
    from smartpipeline_spark import sources
    from smartpipeline_spark.functions.dedup import (
        jaccard_pairs,
        minhash_candidates,
        minhash_signatures,
    )

    docs = sources.table(spark, "documents", SF_SMOKE)
    exact = {
        (r["d1"], r["d2"])
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    cands = {
        (r["d1"], r["d2"])
        for r in minhash_candidates(minhash_signatures(docs)).collect()
    }
    assert exact, "fixture should contain near-duplicate documents"
    # every high-similarity pair must surface as an LSH candidate
    recall = len(exact & cands) / len(exact)
    assert recall >= 0.9, (recall, exact - cands)


def test_minhash_verified_output_has_no_false_positives(spark):
    from smartpipeline_spark.functions import EXT_QUERIES
    from smartpipeline_spark.functions.dedup import JACCARD_THRESHOLD

    rows = EXT_QUERIES["ext_dedup_minhash"](spark, SF_SMOKE).collect()
    assert all(r["jaccard_verified"] >= JACCARD_THRESHOLD for r in rows)


def test_simhash_pairs_are_symmetric_and_bounded(spark):
    from smartpipeline_spark.functions import EXT_QUERIES

    rows = EXT_QUERIES["ext_dedup_simhash"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r["d1"] < r["d2"]
        assert 0 <= r["hamming"] <= 3


def test_lsh_ann_recall_against_bruteforce(spark):
    from smartpipeline_spark.functions import EXT_QUERIES

    exact = EXT_QUERIES["ext_knn_bruteforce"](spark, SF_SMOKE).collect()
    approx = EXT_QUERIES["ext_knn_lsh"](spark, SF_SMOKE).collect()
    exact_top3 = {
        (r["query_id"], r["neighbor_id"]) for r in exact if r["rank"] <= 3
    }
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # single-table hyperplane LSH: recall of the very top neighbors
    recall = len(exact_top3 & approx_pairs) / len(exact_top3)
    assert recall >= 0.3, recall


def test_exact_dedup_keeps_one_per_group(spark):
    from smartpipeline_spark.functions import EXT_QUERIES

    df = EXT_QUERIES["ext_dedup_exact"](spark, SF_SMOKE)
    agg = df.agg(
        F.count("*").alias("groups"), F.sum("n_copies").alias("total")
    ).collect()[0]
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert agg["total"] == n_docs
    assert agg["groups"] <= n_docs


def test_multimodal_decode_shapes(spark):
    from smartpipeline_spark.functions import EXT_QUERIES

    rows = EXT_QUERIES["ext_multimodal_decode"](spark, SF_SMOKE).collect()
    assert len(rows) == 500
    assert all(r["width"] >= 1 and r["n_frames"] >= 1 for r in rows)
