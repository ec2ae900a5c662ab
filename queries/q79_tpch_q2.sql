-- q79_tpch_q2: DuckDB oracle (ANSI SQL over the shared parquet views).
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
       eu_cost AS (
         SELECT ps_partkey, ps_suppkey, ps_supplycost
         FROM partsupp, supplier, nation, region
         WHERE s_suppkey = ps_suppkey AND s_nationkey = n_nationkey
           AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
       SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
       FROM part, eu_cost, supplier, nation, region
       WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'EUROPE'
         AND ps_supplycost = (SELECT MIN(c2.ps_supplycost) FROM eu_cost c2
                              WHERE c2.ps_partkey = p_partkey)
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
