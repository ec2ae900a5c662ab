-- ext_readability: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH m AS (
          SELECT doc_id,
                 greatest(len(list_filter(string_split_regex(trim(text), '\s+'),
                                          x -> x <> '')), 1) * 1.0 AS words,
                 greatest(len(regexp_extract_all(text, '[.!?]+')), 1) * 1.0 AS sents,
                 greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) * 1.0 AS syll
          FROM documents),
        s AS (
          SELECT doc_id, words, sents, syll,
                 floor((206.835 - 1.015 * (words / sents)
                        - 84.6 * (syll / words)) * 100.0 + 0.5) / 100.0 AS flesch
          FROM m)
        SELECT doc_id,
               CAST(words AS BIGINT) AS n_words,
               CAST(sents AS BIGINT) AS n_sentences,
               CAST(syll AS BIGINT) AS n_syllables,
               flesch,
               CASE WHEN flesch >= 70 THEN 'easy'
                    WHEN flesch >= 50 THEN 'standard'
                    WHEN flesch >= 30 THEN 'difficult'
                    ELSE 'very_difficult' END AS band
        FROM s
