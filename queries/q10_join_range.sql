-- q10_join_range: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT l_returnflag, COUNT(*) AS n_rows,
              FLOOR((CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_rev
       FROM lineitem JOIN orders
         ON l_orderkey = o_orderkey
        AND CAST(l_shipdate AS DATE) BETWEEN CAST(o_orderdate AS DATE)
                                         AND CAST(o_orderdate AS DATE) + 90
       GROUP BY l_returnflag
