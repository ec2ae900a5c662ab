-- q39_stat_moments: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT l_returnflag,
              FLOOR(corr(l_quantity, l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS corr_qty_price,
              FLOOR(covar_samp(l_quantity, l_extendedprice) * 100.0 + 0.5) / 100.0 AS covar_qp,
              FLOOR(stddev_samp(l_extendedprice) * 100.0 + 0.5) / 100.0 AS sd_price,
              FLOOR(var_pop(l_quantity) * 10000.0 + 0.5) / 10000.0 AS var_qty,
              FLOOR(regr_slope(l_extendedprice, l_quantity) * 10000.0 + 0.5) / 10000.0 AS slope
       FROM lineitem GROUP BY l_returnflag
