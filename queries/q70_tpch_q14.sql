-- q70_tpch_q14: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT FLOOR(100.0
                    * CAST(SUM(CASE WHEN p_type = 'PROMO'
                               THEN CAST(l_extendedprice * (1 - l_discount)
                                         AS DECIMAL(28,12)) ELSE 0 END) AS DOUBLE)
                    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                    AS DECIMAL(28,12))) AS DOUBLE)
                    * 10000.0 + 0.5) / 10000.0 AS promo_revenue
       FROM lineitem, part
       WHERE l_partkey = p_partkey
         AND CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
         AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'
