-- ext_pack_sequences: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH t AS (
         SELECT doc_id,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+')) END AS tokens
         FROM documents),
       c AS (
         SELECT doc_id, tokens,
                CAST(COALESCE(SUM(tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS start_off
         FROM t)
       SELECT doc_id, tokens, start_off,
              start_off // 512 AS seq_id,
              ((start_off + greatest(tokens, 1) - 1) // 512)
                > (start_off // 512) AS straddles
       FROM c
