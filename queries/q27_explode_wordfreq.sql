-- q27_explode_wordfreq: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT word, COUNT(*) AS n
       FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
             FROM documents)
       GROUP BY word
       HAVING COUNT(*) >= 50
