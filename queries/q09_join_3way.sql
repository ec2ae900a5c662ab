-- q09_join_3way: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT l_orderkey,
              strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
              o_orderpriority,
              FLOOR((CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
         AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
       GROUP BY l_orderkey, o_date, o_orderpriority
