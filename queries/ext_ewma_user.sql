-- ext_ewma_user: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH w AS (
          SELECT user_id, ts, value,
                 max(ts) OVER (PARTITION BY user_id) AS anchor
          FROM events
        )
        SELECT user_id,
               round(sum(value * power(2.0, -((date_diff('microsecond', ts, anchor) / 1e6) / 604800.0))), 4) AS decayed_value,
               round(sum(power(2.0, -((date_diff('microsecond', ts, anchor) / 1e6) / 604800.0))), 4) AS decayed_n,
               round(sum(value * power(2.0, -((date_diff('microsecond', ts, anchor) / 1e6) / 604800.0)))
                     / sum(power(2.0, -((date_diff('microsecond', ts, anchor) / 1e6) / 604800.0))), 4) AS ewma_value,
               max(ts) AS last_ts
        FROM w
        GROUP BY user_id
