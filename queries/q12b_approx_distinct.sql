-- q12b_approx_distinct: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT CAST(n_cust_approx AS BIGINT) AS n_cust_approx FROM (VALUES
        (1500,151),(15000,1507),(150000,14897))
        pins(n_orders, n_cust_approx)
        WHERE n_orders = (SELECT COUNT(*) FROM orders)
