-- ext_dedup_incremental: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH f AS (
          SELECT doc_id, text,
                 md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
                 ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
          FROM documents),
        corpus AS (SELECT * FROM f WHERE bucket < 90),
        batch AS (SELECT * FROM f WHERE bucket >= 90)
       SELECT b.doc_id, b.fp FROM batch b
       WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)
         AND NOT EXISTS (SELECT 1 FROM batch b2
                         WHERE b2.fp = b.fp AND b2.doc_id < b.doc_id)
