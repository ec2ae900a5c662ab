-- q72_tpch_q17: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                    / 7.0 * 100.0 + 0.5) / 100.0 AS avg_yearly
       FROM lineitem, part
       WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
         AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                           FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
