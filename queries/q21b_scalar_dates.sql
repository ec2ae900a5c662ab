-- q21b_scalar_dates: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_orderkey,
              year(o_orderdate) AS o_year,
              month(o_orderdate) AS o_month,
              quarter(o_orderdate) AS o_quarter,
              strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
              date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
              strftime(CAST(o_orderdate AS DATE) + 7, '%Y-%m-%d') AS next_week
       FROM orders
