"""SQL surface for the engine's row-local operators.

``register_sql_functions(spark)`` issues Spark 4 declarative SQL UDFs
(``CREATE OR REPLACE TEMPORARY FUNCTION ... RETURN``) mirroring the
row-local text/curation/similarity expressions, so a SQL-only user
gets the engine's scalar vocabulary — fingerprints, token counts,
quality scoring, PII redaction, shingling, Jaccard/cosine/Hamming —
directly in ``spark.sql`` queries.

These are MACROS, not Python UDFs: Spark inlines the body into the
logical plan, so every function participates in whole-stage codegen,
pushes predicates normally, and crosses no serialization boundary —
identical 100 TB cost to writing the expression by hand (the q48
lesson applied as a library surface).  Each definition is the SQL
transliteration of the Column expression used by the corresponding
DataFrame operator (functions/text.py, functions/curation.py,
functions/dedup.py); tests/test_sqlfuncs.py pins the two forms equal
row-for-row on the documents corpus.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from smartpipeline_spark.functions.text import STOPWORDS, TOKEN_REGEX

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\\\.[a-z]{2,}"
_URL_RE = "https?://[^ ]+"
_PHONE_RE = "\\\\+1-555-[0-9]{4}"


def _stop_hits_sql() -> str:
    parts = [
        "CAST((length(concat(' ', lower(t), ' ')) - "
        f"length(replace(concat(' ', lower(t), ' '), ' {w} ', ''))) / {len(w) + 2} AS INT)"
        for w in STOPWORDS
    ]
    return " + ".join(parts)


# name -> (signature, return type, body) — bodies reference the
# parameter names in the signature
_DEFS: dict[str, tuple[str, str, str]] = {
    # exact-dedup key: md5 of whitespace-normalized lowercase text
    "doc_fingerprint": (
        "(t STRING)",
        "STRING",
        r"md5(regexp_replace(lower(trim(t)), '\\s+', ' '))",
    ),
    # whitespace token count, null/empty-safe (text.py _word_count_expr)
    "ws_token_count": (
        "(t STRING)",
        "INT",
        r"CASE WHEN length(trim(t)) = 0 THEN 0 "
        r"ELSE size(split(trim(t), '\\s+')) END",
    ),
    # BPE-ish token count: letter runs | digit runs | single symbol
    "bpe_token_count": (
        "(t STRING)",
        "INT",
        # the Python-side regex string needs its backslashes doubled to
        # survive SQL string-literal unescaping
        f"size(regexp_extract_all(t, '{TOKEN_REGEX.replace(chr(92), chr(92) * 2)}', 0))",
    ),
    # composite heuristic quality score (text.py ext_quality_score)
    "quality_score": (
        "(t STRING)",
        "DOUBLE",
        "FLOOR(CAST("
        "  CASE WHEN length(t) BETWEEN 50 AND 100000 THEN 0.4D ELSE 0.0D END"
        "  + CASE WHEN size(regexp_extract_all(t, '[.,;:!?]', 0)) * 1.0D"
        "           / greatest(length(t), 1) < 0.1D THEN 0.3D ELSE 0.0D END"
        f"  + CASE WHEN ({_stop_hits_sql()}) > 0 THEN 0.3D ELSE 0.0D END"
        " AS DOUBLE) * 100.0D + 0.5D) / 100.0D",
    ),
    # PII scrub (curation.py redact_pii regex chain, same order)
    "redact_pii": (
        "(t STRING)",
        "STRING",
        f"regexp_replace(regexp_replace(regexp_replace(t,"
        f" '{_EMAIL_RE}', '<EMAIL>'),"
        f" '{_URL_RE}', '<URL>'),"
        f" '{_PHONE_RE}', '<PHONE>')",
    ),
    # distinct word n-gram shingles of normalized text — the exact
    # body of dedup.shingle_array_expr with n as a macro parameter:
    # the split is bound ONCE per row via transform(array(..), ws ->)
    # (inlining it into the per-shingle slice re-runs the regex per
    # shingle, a measured ~40x blowup), and sequence() never sees a
    # descending range (sequence(1, 0) counts DOWN in Spark)
    "word_shingles": (
        "(t STRING, n INT)",
        "ARRAY<STRING>",
        r"transform(array(split(lower(trim(t)), '\\s+')),"
        r" ws -> CASE WHEN size(ws) >= n"
        r"       THEN array_distinct(transform(sequence(0, size(ws) - n),"
        r"            i -> concat_ws(' ', slice(ws, i + 1, n))))"
        r"       ELSE CAST(array() AS array<string>) END)[0]",
    ),
    # set Jaccard over two token arrays, empty-safe
    "jaccard_sim": (
        "(a ARRAY<STRING>, b ARRAY<STRING>)",
        "DOUBLE",
        "CASE WHEN size(array_union(a, b)) = 0 THEN 0.0D "
        "ELSE size(array_intersect(a, b)) * 1.0D / size(array_union(a, b)) END",
    ),
    # cosine similarity over two float vectors (similarity.py scoring)
    "cosine_sim": (
        "(a ARRAY<FLOAT>, b ARRAY<FLOAT>)",
        "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * y), 0.0D,"
        " (acc, v) -> acc + v)"
        " / (sqrt(aggregate(a, 0.0D, (acc, v) -> acc + CAST(v AS DOUBLE) * v))"
        "    * sqrt(aggregate(b, 0.0D, (acc, v) -> acc + CAST(v AS DOUBLE) * v)))",
    ),
    # deterministic md5 keep-bucket (curation._keep_bucket /
    # hash_bucket): the rerun- and append-stable row-bucketing
    # primitive behind split / balance / mixing / shard assignment
    "hash_bucket": (
        "(k STRING, m BIGINT)",
        "BIGINT",
        "CAST(conv(substring(md5(k), 1, 8), 16, 10) AS BIGINT) % m",
    ),
    # Hamming distance between 64-bit fingerprints (SimHash / pHash)
    "hamming64": (
        "(a BIGINT, b BIGINT)",
        "INT",
        "CAST(bit_count(a ^ b) AS INT)",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every engine SQL macro as a TEMPORARY FUNCTION in the
    session catalog; returns the registered names.  Idempotent
    (CREATE OR REPLACE)."""
    for name, (sig, ret, body) in _DEFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(_DEFS)
