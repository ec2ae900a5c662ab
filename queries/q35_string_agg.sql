-- q35_string_agg: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT n_name,
              string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name
