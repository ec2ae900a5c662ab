-- q47_try_arith: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_orderkey,
              o_totalprice / NULLIF(o_orderkey % 3, 0) AS safe_div,
              TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
              TRY_CAST(o_orderstatus AS INT) AS bad_cast,
              CASE WHEN o_orderkey = 0 THEN 9223372036854775807
                   ELSE NULL END AS ovf_add
       FROM orders
