-- q32_pivot: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_orderpriority,
               COALESCE("F", 0) AS status_f,
               COALESCE("O", 0) AS status_o,
               COALESCE("P", 0) AS status_p
        FROM (PIVOT orders ON o_orderstatus IN ('F', 'O', 'P')
              USING COUNT(*) GROUP BY o_orderpriority)
