-- q24_udf_stage: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT p_partkey, reverse(p_name) AS rev_name FROM part
