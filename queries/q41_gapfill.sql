-- q41_gapfill: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH hourly AS (
         SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
                COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
         FROM events GROUP BY 1, 2),
       b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
       spine AS (
         SELECT et.event_type, u.h
         FROM (SELECT DISTINCT event_type FROM hourly) et, b,
              LATERAL (SELECT unnest(generate_series(b.h0, b.h1)) AS h) u),
       j AS (
         SELECT s.event_type, s.h, coalesce(n, 0) AS n_events, sv
         FROM spine s LEFT JOIN hourly USING (event_type, h)),
       g AS (
         SELECT *, COUNT(sv) OVER (PARTITION BY event_type ORDER BY h
                                   ROWS UNBOUNDED PRECEDING) AS grp
         FROM j)
       SELECT event_type, h, n_events,
              FLOOR(coalesce(MAX(sv) OVER (PARTITION BY event_type, grp), 0.0)
                    * 100.0 + 0.5) / 100.0 AS sum_filled,
              n_events = 0 AS is_gap
       FROM g
