-- q60_scd2: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH init AS (
          SELECT c_custkey AS custkey,
                 FLOOR((c_acctbal) * 100.0 + 0.5) / 100.0 AS bal,
                 DATE '1991-12-31' AS valid_from
          FROM customer),
        chg AS (
          SELECT o_custkey AS custkey,
                 FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS bal,
                 CAST(o_orderdate AS DATE) AS valid_from
          FROM orders GROUP BY o_custkey, CAST(o_orderdate AS DATE)),
        hist AS (SELECT * FROM init UNION ALL SELECT * FROM chg)
       SELECT custkey, bal, valid_from,
              LEAD(valid_from) OVER (PARTITION BY custkey
                                     ORDER BY valid_from) AS valid_to,
              LEAD(valid_from) OVER (PARTITION BY custkey
                                     ORDER BY valid_from) IS NULL AS is_current
       FROM hist
