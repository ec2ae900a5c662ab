-- q43_join_full_outer: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
               c.c_acctbal AS acctbal,
               o.n_orders,
               o.total_f
        FROM (SELECT c_custkey, c_acctbal FROM customer
              WHERE c_acctbal > 7000) c
        FULL OUTER JOIN (
              SELECT o_custkey,
                     COUNT(*) AS n_orders,
                     FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total_f
              FROM orders WHERE o_orderstatus = 'F'
              GROUP BY o_custkey) o
        ON c.c_custkey = o.o_custkey
