-- q20_intersect_except: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT
         (SELECT COUNT(*) FROM (
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O') t) AS n_intersect,
         (SELECT COUNT(*) FROM (
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O') t) AS n_except,
         (SELECT COUNT(*) FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT ALL
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t) AS n_intersect_all,
         (SELECT COUNT(*) FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT ALL
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t) AS n_except_all
