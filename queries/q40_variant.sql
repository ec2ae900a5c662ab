-- q40_variant: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
              CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_dbl,
              json_extract_string(props, '$.missing') IS NULL AS missing_is_null,
              CAST(json_extract_string(props, '$.k') AS INT) >= 0 AS k_nonneg
       FROM events
