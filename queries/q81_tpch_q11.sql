-- q81_tpch_q11: DuckDB oracle (ANSI SQL over the shared parquet views).
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
       nps AS (
         SELECT ps_partkey,
                CAST(ps_supplycost * ps_availqty AS DECIMAL(28,12)) AS v
         FROM partsupp, supplier, nation
         WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
           AND n_name = 'NATION_7'),
       tot AS (SELECT SUM(v) AS total_v FROM nps)
       SELECT ps_partkey,
              FLOOR(CAST(SUM(v) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS part_value
       FROM nps, tot
       GROUP BY ps_partkey, total_v
       HAVING CAST(SUM(v) AS DOUBLE) > CAST(total_v AS DOUBLE) * 0.004
