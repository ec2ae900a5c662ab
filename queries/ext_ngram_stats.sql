-- ext_ngram_stats: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
         SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
         FROM documents),
       bg AS (
         SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS bigram
         FROM words, LATERAL (
           SELECT unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i) t)
       SELECT bigram, COUNT(*) AS df
       FROM bg GROUP BY bigram
       ORDER BY df DESC, bigram LIMIT 20
