-- q63_tpch_q3: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT l_orderkey,
               FLOOR((CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,12))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND CAST(o_orderdate AS DATE) < DATE '1998-07-01'
          AND CAST(l_shipdate AS DATE) > DATE '1998-07-01'
        GROUP BY l_orderkey, orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10
