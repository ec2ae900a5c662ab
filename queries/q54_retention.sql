-- q54_retention: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH days AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        first_day AS (SELECT user_id, MIN(d) AS d0 FROM days GROUP BY user_id)
       SELECT f.d0 AS cohort_day,
              COUNT(*) AS cohort_size,
              COUNT(r.user_id) AS retained_d1
       FROM first_day f
       LEFT JOIN days r ON r.user_id = f.user_id AND r.d = f.d0 + 1
       GROUP BY f.d0
