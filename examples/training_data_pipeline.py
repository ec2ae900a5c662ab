"""End-to-end training-data curation pipeline — the north-star
composition: raw documents -> exact dedup -> near-dup (MinHash+LSH)
removal -> quality + language filters -> token accounting -> curated
parquet, entirely as one lazy DataFrame program (single action at the
write; every filter fuses into the scans).

This is the shape a 100 TB pretraining-data job takes on this engine:
each step is a column-algebra or bucketed-join operator from
``functions/`` — no driver loops, no per-row Python.

Run: python examples/training_data_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from smartpipeline_spark import get_spark, sources
from smartpipeline_spark.functions import EXT_QUERIES
from smartpipeline_spark.functions.dedup import JACCARD_THRESHOLD  # noqa: F401


def curate(spark, sf_dir: str):
    docs = sources.table(spark, "documents", sf_dir)

    # 1. exact dedup: keep the lowest doc_id of each fingerprint group
    keep_exact = (
        EXT_QUERIES["ext_dedup_exact"](spark, sf_dir)
        .select(F.col("keep_id").alias("doc_id"))
    )

    # 2. near-dup removal: drop the higher doc_id of every verified
    #    MinHash+LSH pair (candidates only ever came from band buckets)
    near_dupes = (
        EXT_QUERIES["ext_dedup_minhash"](spark, sf_dir)
        .select(F.col("d2").alias("doc_id"))
        .distinct()
    )

    # 3. quality + language gates (pure column algebra, fuse into scan)
    quality = EXT_QUERIES["ext_quality_score"](spark, sf_dir).select(
        "doc_id", "quality"
    )
    lang = EXT_QUERIES["ext_lang_id"](spark, sf_dir)

    # 4. token accounting for the data card
    tokens = EXT_QUERIES["ext_token_count"](spark, sf_dir).select(
        "doc_id", "n_ws_tokens"
    )

    return (
        docs.join(keep_exact, "doc_id", "left_semi")
        .join(near_dupes, "doc_id", "left_anti")
        .join(quality, "doc_id")
        .join(lang, "doc_id")
        .join(tokens, "doc_id")
        .filter((F.col("quality") >= 0.7) & (F.col("pred_lang") == "en"))
        .select("doc_id", "text", "pred_lang", "quality", "n_ws_tokens")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("training-data-pipeline")
    curated = curate(spark, sf_dir)
    out = "/root/repo/.tmp/curated_corpus"
    curated.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    n = back.count()
    toks = back.agg(F.sum("n_ws_tokens")).collect()[0][0]
    print(f"curated {n} docs, {toks} whitespace tokens -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
