-- q58_merge_upsert: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH tgt AS (SELECT c_custkey, c_name, c_acctbal FROM customer
                     WHERE c_custkey <= 1200),
            src AS (SELECT o_custkey,
                           FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS new_bal
                    FROM orders GROUP BY o_custkey)
       SELECT COALESCE(t.c_custkey, s.o_custkey) AS custkey,
              CASE WHEN t.c_custkey IS NULL THEN 'new-customer'
                   ELSE t.c_name END AS name,
              CASE WHEN s.o_custkey IS NULL THEN t.c_acctbal
                   ELSE s.new_bal END AS acctbal,
              CASE WHEN t.c_custkey IS NULL THEN 'insert'
                   WHEN s.o_custkey IS NULL THEN 'keep'
                   ELSE 'update' END AS merge_action
       FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.o_custkey
