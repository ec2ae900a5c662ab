-- ext_data_card: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH per AS (
          SELECT source, lang,
                 COUNT(*) AS n_docs,
                 CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END)
                      AS BIGINT) AS n_tokens
          FROM documents GROUP BY source, lang),
        tot AS (SELECT SUM(n_tokens) AS total_tokens FROM per)
       SELECT source, lang, n_docs, n_tokens,
              FLOOR(n_tokens * 1.0 / total_tokens * 10000.0 + 0.5) / 10000.0
                AS token_share
       FROM per, tot
