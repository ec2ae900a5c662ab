-- q33_filtered_agg: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               FLOOR((CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total_finished
        FROM orders GROUP BY o_orderpriority
