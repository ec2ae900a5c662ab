-- ext_sample_per_group: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH h AS (
         SELECT doc_id, lang,
                ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
         FROM documents)
       SELECT doc_id, lang,
              CAST(row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id)
                   AS BIGINT) AS sample_rank
       FROM h
       QUALIFY sample_rank <= 25
