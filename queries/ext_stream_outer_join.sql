-- ext_stream_outer_join: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT l.event_id AS click_id, r.event_id AS view_id
       FROM events l LEFT JOIN events r
         ON l.user_id = r.user_id
        AND r.event_type = 'view'
        AND CAST(r.ts AS TIMESTAMP)
            BETWEEN CAST(l.ts AS TIMESTAMP) - INTERVAL 10 MINUTE
                AND CAST(l.ts AS TIMESTAMP)
       WHERE l.event_type = 'click'
