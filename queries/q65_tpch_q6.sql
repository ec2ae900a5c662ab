-- q65_tpch_q6: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT FLOOR((CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,12))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
