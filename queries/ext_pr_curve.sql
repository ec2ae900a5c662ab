-- ext_pr_curve: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH s AS (
         SELECT COALESCE(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+')) END, 0) AS threshold,
                CASE WHEN contains(text, 'vector') THEN 1 ELSE 0 END AS y
         FROM documents),
       h AS (SELECT threshold,
                    CAST(SUM(y) AS BIGINT) AS n_pos,
                    CAST(SUM(1 - y) AS BIGINT) AS n_neg
             FROM s GROUP BY threshold),
       c AS (SELECT threshold,
                    CAST(SUM(n_pos) OVER (ORDER BY threshold DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS tp,
                    CAST(SUM(n_neg) OVER (ORDER BY threshold DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS fp
             FROM h),
       t AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS p_total FROM h)
       SELECT threshold, tp, fp,
              FLOOR(tp * 1.0 / (tp + fp) * 1000000.0 + 0.5) / 1000000.0
                AS precision,
              FLOOR(tp * 1.0 / p_total * 1000000.0 + 0.5) / 1000000.0
                AS recall
       FROM c, t
