-- q13_rollup: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT n_name, c_mktsegment, COUNT(*) AS n_cust,
              FLOOR((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 100.0 + 0.5) / 100.0 AS avg_bal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY ROLLUP(n_name, c_mktsegment)
