-- q53_funnel: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH f AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                 MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                 MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purch
          FROM events GROUP BY user_id)
       SELECT COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
              COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
              COUNT(CASE WHEN t_click > t_view AND t_purch > t_click THEN 1 END)
                AS n_full_funnel
       FROM f
