-- q31_scalar_subquery: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT p_partkey, p_name, p_retailprice
       FROM part
       WHERE p_retailprice > 1.02 * (SELECT AVG(p_retailprice) FROM part)
