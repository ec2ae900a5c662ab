-- q02_sink_roundtrip: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT COUNT(*) AS n_rows,
               FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_total,
               (SELECT COUNT(*) FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1997)
                 AS n_rows_1997,
               (SELECT FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 FROM orders
                WHERE year(CAST(o_orderdate AS DATE)) = 1997) AS sum_total_1997
        FROM orders
