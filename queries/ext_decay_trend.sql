-- ext_decay_trend: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH anchor AS (SELECT max(ts) AS anchor_ts FROM events)
        SELECT event_type,
               round(sum(power(2.0, -((date_diff('microsecond', ts, anchor_ts) / 1e6) / 604800.0))), 4) AS decayed_n,
               round(sum(value * power(2.0, -((date_diff('microsecond', ts, anchor_ts) / 1e6) / 604800.0))), 4) AS decayed_value
        FROM events, anchor
        GROUP BY event_type
