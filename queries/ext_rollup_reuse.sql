-- ext_rollup_reuse: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT strftime(time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)),
                       '%Y-%m-%d') AS day,
               event_type,
               COUNT(*) AS n_events,
               FLOOR((CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_value
       FROM events GROUP BY day, event_type
