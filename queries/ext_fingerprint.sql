-- ext_fingerprint: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT doc_id,
              md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
       FROM documents
