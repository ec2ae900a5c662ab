-- q42_udaf_geomean: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT l_returnflag,
              FLOOR(exp(avg(ln(l_quantity))) * 10000.0 + 0.5) / 10000.0 AS geomean_qty,
              COUNT(*) AS n
       FROM lineitem WHERE l_quantity > 0 GROUP BY l_returnflag
