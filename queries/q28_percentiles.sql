-- q28_percentiles: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_orderstatus,
               FLOOR((quantile_cont(o_totalprice, 0.5)) * 100.0 + 0.5) / 100.0 AS median_price,
               FLOOR((quantile_cont(o_totalprice, 0.9)) * 100.0 + 0.5) / 100.0 AS p90_price,
               FLOOR((MIN(o_totalprice)) * 100.0 + 0.5) / 100.0 AS min_price,
               FLOOR((MAX(o_totalprice)) * 100.0 + 0.5) / 100.0 AS max_price
        FROM orders GROUP BY o_orderstatus
