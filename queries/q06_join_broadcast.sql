-- q06_join_broadcast: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT n_name,
               FLOOR((CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
