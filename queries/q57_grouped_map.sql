-- q57_grouped_map: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH ranked AS (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey)
                   AS rank
          FROM orders)
       SELECT o_orderpriority, o_orderkey, o_totalprice, rank
       FROM ranked WHERE rank <= 3
