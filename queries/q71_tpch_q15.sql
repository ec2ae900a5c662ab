-- q71_tpch_q15: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,12)))
                  AS total
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name,
              FLOOR(CAST(total AS DOUBLE) * 100.0 + 0.5) / 100.0 AS total_revenue
       FROM supplier, revenue
       WHERE s_suppkey = supplier_no
         AND total = (SELECT MAX(total) FROM revenue)
