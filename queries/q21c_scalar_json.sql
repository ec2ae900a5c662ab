-- q21c_scalar_json: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
              event_type,
              CAST(json_extract_string(props, '$.k') AS INT) AS k_from_map,
              len(json_keys(props)) AS n_keys,
              json_keys(props)[1] AS first_key,
              CAST(json_extract_string(props, '$.k') AS INT) AS k_typed
       FROM events
