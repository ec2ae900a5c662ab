-- q15_window_topk: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT o_custkey, rn, rnk, drnk, quartile, next_orderkey,
              o_orderkey, o_totalprice FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER w AS rn,
                RANK() OVER w AS rnk,
                DENSE_RANK() OVER w AS drnk,
                NTILE(4) OVER w AS quartile,
                LEAD(o_orderkey) OVER w AS next_orderkey
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey)) t
       WHERE rn <= 3
