-- q21d_array_map: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT doc_id,
              len(string_split(text, ' ')) AS n_words,
              array_to_string(string_split(text, ' ')[1:3], '-') AS first3,
              CAST(list_contains(string_split(lower(text), ' '), 'data') AS INT) AS has_data,
              list_sort(string_split(lower(substring(text, 1, 30)), ' '))[1] AS min_word,
              string_split(text, ' ')[-1] AS last_word,
              len(list_filter(string_split(text, ' '), w -> length(w) > 5))
                AS n_long_words,
              CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w)))
                AS BIGINT) AS total_chars,
              array_to_string(list_transform(string_split(text, ' ')[1:2],
                                             w -> upper(w)), '-') AS first2_upper
       FROM documents
