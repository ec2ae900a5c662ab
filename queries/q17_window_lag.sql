-- q17_window_lag: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_custkey, o_orderkey,
              LAG(o_totalprice) OVER w AS prev_price,
              FLOOR((o_totalprice - LAG(o_totalprice) OVER w) * 100.0 + 0.5) / 100.0 AS delta,
              FIRST_VALUE(o_orderkey) OVER w AS first_key,
              NTH_VALUE(o_orderkey, 3) OVER w AS third_key,
              FLOOR((PERCENT_RANK() OVER w * 1000.0) * 100.0 + 0.5) / 100.0 AS pct_rank_k,
              FLOOR((CUME_DIST() OVER w * 1000.0) * 100.0 + 0.5) / 100.0 AS cume_k
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey
                    ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
