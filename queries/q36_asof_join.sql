-- q36_asof_join: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT l.event_id, l.user_id,
              epoch_us(l.ts) AS click_us,
              r.event_id AS matched_view_id,
              epoch_us(r.ts) AS view_us
       FROM (SELECT * FROM events WHERE event_type = 'click') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
         ON l.user_id = r.user_id AND l.ts >= r.ts
