-- q64_tpch_q4: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders
       WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
         AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90)
       GROUP BY o_orderpriority
