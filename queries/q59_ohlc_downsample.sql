-- q59_ohlc_downsample: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT user_id,
               strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)),
                        '%Y-%m-%d %H:%M:%S') AS hour_start,
               COUNT(*) AS n_events,
               FLOOR((arg_min(value, ts)) * 100.0 + 0.5) / 100.0 AS open_v,
               FLOOR((arg_max(value, ts)) * 100.0 + 0.5) / 100.0 AS close_v,
               FLOOR((MIN(value)) * 100.0 + 0.5) / 100.0 AS low_v,
               FLOOR((MAX(value)) * 100.0 + 0.5) / 100.0 AS high_v
        FROM events
        GROUP BY user_id, hour_start
