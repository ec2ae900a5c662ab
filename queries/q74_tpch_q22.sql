-- q74_tpch_q22: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT cntrycode, COUNT(*) AS numcust,
               FLOOR((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS totacctbal
        FROM (SELECT c_nationkey % 10 AS cntrycode, c_acctbal, c_custkey
              FROM customer
              WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)
                AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)))
                                              AS DOUBLE) / COUNT(*)
                                 FROM customer
                                 WHERE c_acctbal > 0.0
                                   AND c_nationkey % 10 IN (1, 2, 3, 4, 5))
                AND NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey
                                  AND CAST(o_orderdate AS DATE)
                                      >= DATE '2000-01-01')) custsale
        GROUP BY cntrycode
