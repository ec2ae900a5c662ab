-- q45_unpivot: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH w AS (
          SELECT o_orderpriority,
                 CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS n_open,
                 CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS n_finished,
                 FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total_price
          FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority, 'n_open' AS metric, n_open AS value FROM w
        UNION ALL
        SELECT o_orderpriority, 'n_finished' AS metric, n_finished AS value FROM w
        UNION ALL
        SELECT o_orderpriority, 'total_price' AS metric, total_price AS value FROM w
