-- q78_tpch_q21: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT s_name, COUNT(*) AS numwait
       FROM supplier, lineitem l1, orders, nation
       WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         AND o_orderstatus = 'F'
         AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
         AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND CAST(l3.l_shipdate AS DATE)
                               > CAST(o_orderdate AS DATE) + 60)
       GROUP BY s_name
       ORDER BY numwait DESC, s_name LIMIT 100
