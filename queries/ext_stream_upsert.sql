-- ext_stream_upsert: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT strftime(time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)),
                       '%Y-%m-%d-%H') AS bucket,
              event_type,
              COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       FROM events GROUP BY bucket, event_type
