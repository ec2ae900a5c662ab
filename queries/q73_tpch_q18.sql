-- q73_tpch_q18: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT c_name, c_custkey, o_orderkey,
              strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
              o_totalprice,
              SUM(l_quantity) AS sum_qty
       FROM customer, orders, lineitem
       WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                            GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
         AND c_custkey = o_custkey AND o_orderkey = l_orderkey
       GROUP BY c_name, c_custkey, o_orderkey, orderdate, o_totalprice
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
