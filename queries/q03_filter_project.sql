-- q03_filter_project: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT l_orderkey, l_linenumber,
              l_extendedprice * (1 - l_discount) AS rev
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
