-- q49_cross_join: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT r.r_name, n.n_name,
              CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_home
       FROM region r CROSS JOIN nation n
