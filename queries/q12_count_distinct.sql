-- q12_count_distinct: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
       FROM orders
