-- q52_histogram: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH s AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
                  FROM orders)
       SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 10.0)) AS BIGINT),
                    CAST(9 AS BIGINT)) AS bin,
              COUNT(*) AS n
       FROM orders, s
       GROUP BY bin
