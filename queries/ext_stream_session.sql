-- ext_stream_session: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH e AS (
         SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us, value
         FROM events),
       marked AS (
         SELECT user_id, t_us, value,
                CASE WHEN t_us - LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us)
                          >= 1800000000
                       OR LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us) IS NULL
                     THEN 1 ELSE 0 END AS new_sess
         FROM e),
       sess AS (
         SELECT user_id, t_us, value,
                SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM marked)
       SELECT user_id, MIN(t_us) AS sess_start_us, COUNT(*) AS n_events,
              FLOOR((CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE)) * 100.0 + 0.5)
                / 100.0 AS sum_value
       FROM sess GROUP BY user_id, sid
