-- q83_tpch_q20: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + i * (S // 4)) % S AS ps_suppkey,
         (p_partkey * 7 + i * 11) % 9999 + 1 AS ps_availqty,
         ((p_partkey * 13 + ((p_partkey + i * (S // 4)) % S) * 7) % 90000)
           / 100.0 + 100.0 AS ps_supplycost
  FROM part,
       (SELECT COUNT(*) AS S FROM supplier) ns,
       (SELECT unnest(generate_series(0, 3)) AS i) gs),
       shipped AS (
         SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
         GROUP BY l_partkey, l_suppkey)
       SELECT DISTINCT s_name, n_name
       FROM supplier, nation, partsupp, shipped
       WHERE s_nationkey = n_nationkey AND n_name = 'NATION_9'
         AND ps_suppkey = s_suppkey
         AND ps_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'red%')
         AND ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         AND ps_availqty > 0.5 * sq
