-- q82_tpch_q16: DuckDB oracle (ANSI SQL over the shared parquet views).
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
       SELECT p_brand, p_type, p_size,
              COUNT(DISTINCT ps_suppkey) AS supplier_cnt
       FROM partsupp, part
       WHERE p_partkey = ps_partkey
         AND p_brand <> 'Brand#5' AND p_type <> 'PROMO'
         AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
         AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size
