-- ext_salted_join: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT s.s_nationkey AS nationkey,
               COUNT(*) AS n_items,
               FLOOR((CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_qty
       FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
       GROUP BY s.s_nationkey
