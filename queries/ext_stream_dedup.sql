-- ext_stream_dedup: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT DISTINCT user_id, event_type FROM events
