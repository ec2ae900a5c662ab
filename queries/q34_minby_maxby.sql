-- q34_minby_maxby: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_custkey,
              min_by(o_orderkey, o_totalprice) AS cheapest_order,
              max_by(o_orderkey, o_totalprice) AS priciest_order
       FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    ROW_NUMBER() OVER (PARTITION BY o_custkey, o_totalprice
                                       ORDER BY o_orderkey) AS rn
             FROM orders) t
       WHERE rn = 1
       GROUP BY o_custkey
