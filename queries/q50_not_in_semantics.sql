-- q50_not_in_semantics: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT c.c_custkey, c.c_mktsegment
       FROM customer c
       WHERE c.c_custkey NOT IN (SELECT o_custkey FROM orders
                                 WHERE o_totalprice > 450000.0)
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderstatus = 'P')
