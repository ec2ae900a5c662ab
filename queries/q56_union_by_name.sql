-- q56_union_by_name: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_orderkey AS k, o_totalprice AS price, NULL AS qty
       FROM orders WHERE o_totalprice > 450000.0
       UNION ALL BY NAME
       SELECT l_quantity AS qty, l_orderkey AS k
       FROM lineitem WHERE l_quantity >= 49
