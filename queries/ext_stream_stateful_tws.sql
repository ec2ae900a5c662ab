-- ext_stream_stateful_tws: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT user_id, COUNT(*) AS n_events
       FROM events GROUP BY user_id
