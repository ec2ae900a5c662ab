-- q46_recursive_cte: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH RECURSIVE d AS (
         SELECT CAST(0 AS BIGINT) AS k, 0 AS depth
         UNION ALL
         SELECT c.c_custkey, d.depth + 1
         FROM customer c JOIN d ON (c.c_custkey - 1) // 2 = d.k
         WHERE c.c_custkey > 0)
       SELECT depth, COUNT(*) AS n, MIN(k) AS first_k, MAX(k) AS last_k
       FROM d GROUP BY depth
