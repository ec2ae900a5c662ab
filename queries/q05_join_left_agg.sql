-- q05_join_left_agg: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT c_custkey, c_name,
               COUNT(o_orderkey) AS n_orders,
               COALESCE(FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0, 0.0) AS sum_spent
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
