-- q30_correlated_exists: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_orderpriority, COUNT(*) AS n_orders
       FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND CAST(l_shipdate AS DATE) >
                           CAST(o_orderdate AS DATE) + 60)
       GROUP BY o_orderpriority
