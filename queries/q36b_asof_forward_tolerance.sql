-- q36b_asof_forward_tolerance: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT l.event_id, l.user_id,
              epoch_us(l.ts) AS click_us,
              CASE WHEN r.ts IS NOT NULL
                    AND epoch_us(r.ts) - epoch_us(l.ts) <= 600000000
                   THEN r.event_id END AS next_view_id,
              CASE WHEN r.ts IS NOT NULL
                    AND epoch_us(r.ts) - epoch_us(l.ts) <= 600000000
                   THEN epoch_us(r.ts) END AS view_us
       FROM (SELECT * FROM events WHERE event_type = 'click') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
         ON l.user_id = r.user_id AND l.ts <= r.ts
