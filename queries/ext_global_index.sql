-- ext_global_index: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH keyed AS (
          SELECT doc_id,
                 ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS k
          FROM documents)
       SELECT doc_id, k,
              CAST(ROW_NUMBER() OVER (ORDER BY k) - 1 AS BIGINT) AS row_idx
       FROM keyed
