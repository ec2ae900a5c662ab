-- ext_score_auc: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH s AS (
         SELECT COALESCE(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+')) END, 0) AS score,
                CASE WHEN contains(text, 'vector') THEN 1 ELSE 0 END AS y
         FROM documents),
       h AS (SELECT score,
                    CAST(SUM(y) AS BIGINT) AS n_pos,
                    CAST(SUM(1 - y) AS BIGINT) AS n_neg
             FROM s GROUP BY score),
       c AS (SELECT score, n_pos, n_neg,
                    CAST(COALESCE(SUM(n_neg) OVER (ORDER BY score
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS cum_neg
             FROM h)
       SELECT FLOOR(SUM(n_pos * (cum_neg + n_neg / 2.0))
                    / (SUM(n_pos) * SUM(n_neg)) * 1000000.0 + 0.5)
              / 1000000.0 AS auc,
              CAST(SUM(n_pos) AS BIGINT) AS n_pos,
              CAST(SUM(n_neg) AS BIGINT) AS n_neg
       FROM c
