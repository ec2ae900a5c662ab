-- q11_agg_pricing_summary: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT l_returnflag, l_linestatus,
              FLOOR((CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_qty,
              FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_base_price,
              FLOOR((CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
              FLOOR((CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS DECIMAL(22,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_charge,
              FLOOR((CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 100.0 + 0.5) / 100.0 AS avg_qty,
              FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 100.0 + 0.5) / 100.0 AS avg_price,
              FLOOR((CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 100.0 + 0.5) / 100.0 AS avg_disc,
              COUNT(*) AS count_order
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus
