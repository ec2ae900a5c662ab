-- q51_grouping_flags: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT n_name, c_mktsegment,
              GROUPING(n_name) AS g_n, GROUPING(c_mktsegment) AS g_m,
              COUNT(*) AS n
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY ROLLUP(n_name, c_mktsegment)
