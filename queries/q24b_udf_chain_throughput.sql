-- q24b_udf_chain_throughput: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT l_orderkey, l_linenumber,
              reverse(l_returnflag) AS flag_rev,
              l_extendedprice * (1 - l_discount) AS rev,
              CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS size_class
       FROM lineitem
