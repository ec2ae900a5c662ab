"""SQL-macro surface parity: every function registered by
``register_sql_functions`` must return exactly what its DataFrame
twin computes, row for row, on the real documents corpus — and must
stay a macro (no Python UDF node in the plan)."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from smartpipeline_spark import sources
from smartpipeline_spark.sqlfuncs import register_sql_functions
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_view(spark):
    register_sql_functions(spark)
    sources.table(spark, "documents", SF_SMOKE).createOrReplaceTempView("sq_docs")
    return "sq_docs"


def _pairs(df, key="doc_id", val="v"):
    return {r[key]: r[val] for r in df.collect()}


def test_fingerprint_token_counts_match_dataframe_ops(spark, docs_view):
    sql = spark.sql(
        f"""SELECT doc_id, doc_fingerprint(text) AS fp,
                   ws_token_count(text) AS n_ws,
                   bpe_token_count(text) AS n_bpe
            FROM {docs_view}"""
    )
    from smartpipeline_spark.functions.text import ext_token_count

    eng_fp = _pairs(
        sources.table(spark, "documents", SF_SMOKE).select(
            "doc_id",
            F.md5(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " ")
            ).alias("v"),
        )
    )
    eng_tok = {
        r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens)
        for r in ext_token_count(spark, SF_SMOKE).collect()
    }
    for r in sql.collect():
        assert r.fp == eng_fp[r.doc_id]
        assert (r.n_ws, r.n_bpe) == eng_tok[r.doc_id]


def test_quality_score_matches_engine_query(spark, docs_view):
    from smartpipeline_spark.functions.text import ext_quality_score

    eng = {r.doc_id: r.quality for r in ext_quality_score(spark, SF_SMOKE).collect()}
    sql = _pairs(
        spark.sql(f"SELECT doc_id, quality_score(text) AS v FROM {docs_view}")
    )
    assert sql == eng


def test_redact_pii_matches_engine_op(spark, docs_view):
    from smartpipeline_spark.functions.curation import redact_pii

    eng = {
        r.doc_id: r.clean
        for r in redact_pii(sources.table(spark, "documents", SF_SMOKE)).collect()
    }
    sql = _pairs(spark.sql(f"SELECT doc_id, redact_pii(text) AS v FROM {docs_view}"))
    assert sql == eng


def test_word_shingles_match_dedup_inverted_index(spark, docs_view):
    from smartpipeline_spark.functions.dedup import word_shingles

    eng = (
        word_shingles(sources.table(spark, "documents", SF_SMOKE), 5)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("sh")).alias("v"))
    )
    sql = spark.sql(
        f"""SELECT doc_id, sort_array(word_shingles(text, 5)) AS v
            FROM {docs_view}"""
    )
    assert _pairs(sql) == _pairs(eng)


def test_similarity_scalars(spark, docs_view):
    row = spark.sql(
        """SELECT jaccard_sim(array('a','b','c'), array('b','c','d')) AS j,
                  jaccard_sim(array(), array()) AS j0,
                  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                             array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c_orth,
                  cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
                             array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c_same,
                  hamming64(0, -1) AS h_all,
                  hamming64(5, 4) AS h_one"""
    ).collect()[0]
    assert abs(row.j - 2.0 / 4.0) < 1e-12
    assert row.j0 == 0.0
    assert abs(row.c_orth) < 1e-12
    assert abs(row.c_same - 1.0) < 1e-12
    assert row.h_all == 64 and row.h_one == 1


def test_macros_stay_jvm_side(spark, docs_view):
    """The registered functions are macro-expanded — the physical plan
    must show no Python evaluation node."""
    df = spark.sql(
        f"""SELECT doc_id FROM {docs_view}
            WHERE quality_score(text) > 0.5 AND ws_token_count(text) > 3"""
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    # '*' prefix = inside a WholeStageCodegen span in formatted plans
    assert "* Filter" in plan, plan


def test_hash_bucket_matches_dataframe_twin(spark, docs_view):
    """SQL hash_bucket must agree row-for-row with the curation
    keep-bucket primitive (the split/balance/mixing contract), and
    with assign_split's train/val/test boundaries."""
    from smartpipeline_spark.functions.curation import hash_bucket

    sql = spark.sql(
        f"SELECT doc_id, hash_bucket(CAST(doc_id AS STRING), 100) AS v "
        f"FROM {docs_view}"
    )
    eng = sources.table(spark, "documents", SF_SMOKE).select(
        "doc_id", hash_bucket("doc_id", 100).alias("v")
    )
    assert _pairs(sql) == _pairs(eng)
