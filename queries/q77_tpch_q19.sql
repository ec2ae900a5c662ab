-- q77_tpch_q19: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT FLOOR((CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,12))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND (
             (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
              AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
              AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 20 AND 30))
