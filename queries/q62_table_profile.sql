-- q62_table_profile: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT 'o_orderkey' AS col_name,
                  COUNT(*) AS n_rows,
                  COUNT(*) - COUNT(o_orderkey) AS n_nulls,
                  COUNT(DISTINCT o_orderkey) AS n_distinct,
                  CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
                  CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
           FROM orders
UNION ALL
SELECT 'o_custkey' AS col_name,
                  COUNT(*) AS n_rows,
                  COUNT(*) - COUNT(o_custkey) AS n_nulls,
                  COUNT(DISTINCT o_custkey) AS n_distinct,
                  CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
                  CAST(MAX(o_custkey) AS VARCHAR) AS max_val
           FROM orders
UNION ALL
SELECT 'o_orderstatus' AS col_name,
                  COUNT(*) AS n_rows,
                  COUNT(*) - COUNT(o_orderstatus) AS n_nulls,
                  COUNT(DISTINCT o_orderstatus) AS n_distinct,
                  CAST(MIN(o_orderstatus) AS VARCHAR) AS min_val,
                  CAST(MAX(o_orderstatus) AS VARCHAR) AS max_val
           FROM orders
UNION ALL
SELECT 'o_totalprice' AS col_name,
                  COUNT(*) AS n_rows,
                  COUNT(*) - COUNT(o_totalprice) AS n_nulls,
                  COUNT(DISTINCT o_totalprice) AS n_distinct,
                  CAST(MIN(o_totalprice) AS VARCHAR) AS min_val,
                  CAST(MAX(o_totalprice) AS VARCHAR) AS max_val
           FROM orders
UNION ALL
SELECT 'o_orderdate' AS col_name,
                  COUNT(*) AS n_rows,
                  COUNT(*) - COUNT(o_orderdate) AS n_nulls,
                  COUNT(DISTINCT o_orderdate) AS n_distinct,
                  CAST(MIN(o_orderdate) AS VARCHAR) AS min_val,
                  CAST(MAX(o_orderdate) AS VARCHAR) AS max_val
           FROM orders
UNION ALL
SELECT 'o_orderpriority' AS col_name,
                  COUNT(*) AS n_rows,
                  COUNT(*) - COUNT(o_orderpriority) AS n_nulls,
                  COUNT(DISTINCT o_orderpriority) AS n_distinct,
                  CAST(MIN(o_orderpriority) AS VARCHAR) AS min_val,
                  CAST(MAX(o_orderpriority) AS VARCHAR) AS max_val
           FROM orders
