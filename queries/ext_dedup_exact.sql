-- ext_dedup_exact: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
              MIN(doc_id) AS keep_id,
              COUNT(*) AS n_copies
       FROM documents
       GROUP BY fp
