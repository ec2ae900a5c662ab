-- ext_top_terms: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
         SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
         FROM documents),
       counts AS (SELECT lang, word, COUNT(*) AS n
                  FROM words WHERE word <> '' GROUP BY lang, word)
       SELECT lang, word, CAST(n AS BIGINT) AS n,
              CAST(row_number() OVER (PARTITION BY lang
                                      ORDER BY n DESC, word) AS BIGINT) AS rank
       FROM counts
       QUALIFY rank <= 10
