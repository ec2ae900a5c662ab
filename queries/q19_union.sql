-- q19_union: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT
         (SELECT COUNT(*) FROM (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION ALL
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t) AS n_all,
         (SELECT COUNT(*) FROM (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t) AS n_distinct
