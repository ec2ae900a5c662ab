"""Degenerate-input behavior of the extension library: empty frames,
null/empty text, unicode, single-row strata. Every function must
return structurally valid (possibly empty) results — no crashes, no
NaNs where the contract says 0 — because at 100 TB scale some
partition somewhere WILL be empty or degenerate."""

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, LongType

DOCS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_curation_ops_on_empty_corpus(spark):
    from smartpipeline_spark.functions.curation import (
        assign_split, contamination_report, redact_pii,
        repetition_metrics, stratified_sample, quality_gate,
    )

    empty = _docs(spark, [])
    assert assign_split(empty).count() == 0
    assert redact_pii(empty).count() == 0
    assert repetition_metrics(empty).count() == 0
    assert stratified_sample(empty).count() == 0
    assert quality_gate(empty.withColumn("n_chars", F.length("text"))).count() == 0
    assert contamination_report(empty, empty).count() == 0


def test_dedup_ops_on_empty_and_null_text(spark):
    from smartpipeline_spark.functions.dedup import (
        fuzzy_pairs, jaccard_pairs, shingle_sets,
    )

    docs = _docs(spark, [(1, "", "en"), (2, None, "en"), (3, "one two three four", "en")])
    sh = {r.doc_id: r.sh_set for r in shingle_sets(docs.fillna({"text": ""})).collect()}
    assert sh[1] == [] and sh[2] == []
    assert len(sh[3]) == 2  # "one two three", "two three four"
    assert jaccard_pairs(docs.fillna({"text": ""})).count() == 0
    assert fuzzy_pairs(_docs(spark, []), "text").count() == 0


def test_unicode_text_flows_through_fingerprint_and_tokens(spark):
    from smartpipeline_spark.functions import EXT_QUERIES  # noqa: F401  (registry import side effect)
    from smartpipeline_spark.functions.curation import repetition_metrics

    docs = _docs(spark, [
        (1, "héllo wörld héllo wörld häagen", "de"),
        (2, "中文 文本 中文 文本 处理", "zh"),
    ])
    m = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert set(m) == {1, 2}
    assert all(0.0 <= r.top_word_frac <= 1.0 for r in m.values())
    fp = docs.select(F.md5(F.col("text")).alias("fp")).collect()
    assert all(len(r.fp) == 32 for r in fp)


def test_single_stratum_sample_keeps_everything(spark):
    from smartpipeline_spark.functions.curation import stratified_sample

    docs = _docs(spark, [(i, f"doc {i}", "en") for i in range(50)])
    # one stratum: rate = min/n = 1.0 -> keep_lt = 10000 -> all kept
    assert stratified_sample(docs).count() == 50


def test_window_and_agg_on_empty_events(spark):
    from smartpipeline_spark import streaming

    empty = spark.createDataFrame(
        [], "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    assert streaming.tumbling_counts(empty).count() == 0
    assert streaming.sessionize(empty).count() == 0
