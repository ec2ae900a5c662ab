-- ext_skew_report: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH c AS (SELECT o_custkey AS key, COUNT(*) AS n
                  FROM orders GROUP BY o_custkey),
        t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
       SELECT key, n,
              FLOOR(n * 1.0 / total * 1000000.0 + 0.5) / 1000000.0 AS frac
       FROM c, t
       ORDER BY n DESC, key
       LIMIT 10
