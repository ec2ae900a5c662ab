-- q75_interval_join: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH a AS (
         SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS dd,
                MIN(CAST(ts AS TIMESTAMP)) AS a_start,
                MAX(CAST(ts AS TIMESTAMP)) AS a_end
         FROM events GROUP BY user_id, dd),
       b AS (
         SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS b_start,
                time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
                  + INTERVAL 1 HOUR AS b_end
         FROM events GROUP BY 1 HAVING COUNT(*) >= 24)
       SELECT user_id, strftime(dd, '%Y-%m-%d') AS day,
              strftime(b_start, '%Y-%m-%d %H:%M:%S') AS incident_hour,
              epoch_us(least(a_end, b_end)) - epoch_us(greatest(a_start, b_start))
                AS overlap_us
       FROM a JOIN b ON a_start < b_end AND b_start <= a_end
