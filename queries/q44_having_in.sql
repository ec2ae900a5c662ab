-- q44_having_in: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT c.c_name, o.o_orderkey, o.o_totalprice, big.sum_qty
       FROM orders o
       JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
             FROM lineitem GROUP BY l_orderkey
             HAVING SUM(l_quantity) > 150) big
         ON o.o_orderkey = big.l_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
