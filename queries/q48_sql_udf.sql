-- q48_sql_udf: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_orderkey,
               FLOOR((CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_totalprice > 400000.0
        GROUP BY o_orderkey
