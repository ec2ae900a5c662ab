-- q67_tpch_q8: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT yr,
               FLOOR(CAST(SUM(CASE WHEN nation = 'NATION_3'
                                   THEN CAST(volume AS DECIMAL(28,12)) ELSE 0 END)
                          AS DOUBLE)
                     / CAST(SUM(CAST(volume AS DECIMAL(28,12))) AS DOUBLE)
                     * 10000.0 + 0.5) / 10000.0 AS mkt_share
        FROM (SELECT year(CAST(o_orderdate AS DATE)) AS yr,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS nation
              FROM part, supplier, lineitem, orders, customer, nation n1,
                   nation n2, region
              WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
                AND l_orderkey = o_orderkey AND o_custkey = c_custkey
                AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
                AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
                AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01'
                                                  AND DATE '1997-12-31'
                AND p_type = 'PROMO') all_nations
        GROUP BY yr
