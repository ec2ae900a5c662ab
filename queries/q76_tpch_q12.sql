-- q76_tpch_q12: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT l_returnflag,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM orders, lineitem
       WHERE o_orderkey = l_orderkey
         AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
         AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
         AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
       GROUP BY l_returnflag
