-- q80_tpch_q9: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + i * (S // 4)) % S AS ps_suppkey,
         (p_partkey * 7 + i * 11) % 9999 + 1 AS ps_availqty,
         ((p_partkey * 13 + ((p_partkey + i * (S // 4)) % S) * 7) % 90000)
           / 100.0 + 100.0 AS ps_supplycost
  FROM part,
       (SELECT COUNT(*) AS S FROM supplier) ns,
       (SELECT unnest(generate_series(0, 3)) AS i) gs)
       SELECT nation, o_year,
              FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                                  - CAST(ps_supplycost AS DECIMAL(12,2))
                                    * CAST(l_quantity AS DECIMAL(12,2)))
                               AS DOUBLE)
                    * 100.0 + 0.5) / 100.0 AS sum_profit
       FROM (SELECT n_name AS nation,
                    year(CAST(o_orderdate AS DATE)) AS o_year,
                    l_extendedprice, l_discount, ps_supplycost, l_quantity
             FROM part, supplier, lineitem, partsupp, orders, nation
             WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
               AND ps_partkey = l_partkey AND p_partkey = l_partkey
               AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
               AND p_name LIKE '%red%') profit
       GROUP BY nation, o_year
