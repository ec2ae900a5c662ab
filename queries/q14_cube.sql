-- q14_cube: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
              FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total
       FROM orders
       GROUP BY CUBE(o_orderpriority, o_orderstatus)
