-- q55_transitions: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH seq AS (
          SELECT user_id, event_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_type
          FROM events)
       SELECT event_type, next_type, COUNT(*) AS n
       FROM seq WHERE next_type IS NOT NULL
       GROUP BY event_type, next_type
