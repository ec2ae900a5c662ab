-- q04_join_inner: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_orderkey, c_name, o_totalprice
       FROM orders JOIN customer ON o_custkey = c_custkey
