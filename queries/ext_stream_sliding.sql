-- ext_stream_sliding: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT strftime(time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
                      - k * INTERVAL 15 MINUTE, '%Y-%m-%d %H:%M:%S') AS window_start,
              event_type, COUNT(*) AS n_events
       FROM events, LATERAL (SELECT unnest(generate_series(0, 3)) AS k) t
       GROUP BY window_start, event_type
