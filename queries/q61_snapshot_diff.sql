-- q61_snapshot_diff: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH old AS (SELECT c_custkey AS custkey, c_name AS name,
                            FLOOR((c_acctbal) * 100.0 + 0.5) / 100.0 AS acctbal
                     FROM customer),
        tgt AS (SELECT c_custkey, c_name, c_acctbal FROM customer
                WHERE c_custkey <= 1200),
        src AS (SELECT o_custkey, FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS new_bal
                FROM orders GROUP BY o_custkey),
        new AS (
          SELECT COALESCE(t.c_custkey, s.o_custkey) AS custkey,
                 CASE WHEN t.c_custkey IS NULL THEN 'new-customer'
                      ELSE t.c_name END AS name,
                 FLOOR((CASE WHEN s.o_custkey IS NULL THEN t.c_acctbal ELSE s.new_bal END) * 100.0 + 0.5) / 100.0 AS acctbal
          FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.o_custkey)
       SELECT COALESCE(o.custkey, n.custkey) AS custkey,
              CASE WHEN o.custkey IS NULL THEN 'insert'
                   WHEN n.custkey IS NULL THEN 'delete'
                   ELSE 'update' END AS change_type,
              CASE WHEN o.custkey IS NULL OR n.custkey IS NULL THEN ''
                   ELSE array_to_string(list_filter(
                     [CASE WHEN o.name IS DISTINCT FROM n.name THEN 'name' END,
                      CASE WHEN o.acctbal IS DISTINCT FROM n.acctbal THEN 'acctbal' END],
                     x -> x IS NOT NULL), ',') END AS changed_cols,
              o.acctbal AS old_acctbal, n.acctbal AS new_acctbal
       FROM old o FULL OUTER JOIN new n ON o.custkey = n.custkey
       WHERE o.custkey IS NULL OR n.custkey IS NULL
          OR o.name IS DISTINCT FROM n.name
          OR o.acctbal IS DISTINCT FROM n.acctbal
