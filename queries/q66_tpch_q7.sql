-- q66_tpch_q7: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT supp_nation, cust_nation, yr,
               FLOOR((CAST(SUM(CAST(volume AS DECIMAL(28,12))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     year(CAST(l_shipdate AS DATE)) AS yr,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM supplier, lineitem, orders, customer, nation n1, nation n2
              WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
                AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
                AND c_nationkey = n2.n_nationkey
                AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01'
                                                 AND DATE '1997-12-31') shipping
        GROUP BY supp_nation, cust_nation, yr
