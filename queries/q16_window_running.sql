-- q16_window_running: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_custkey, o_orderkey,
              FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS running,
              FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS rolling_30d
       FROM orders
