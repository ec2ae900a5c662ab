-- ext_quality_score: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT doc_id,
              length(text) AS n_chars,
              CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
              len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
              CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' the ', ''))) / 5 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' a ', ''))) / 3 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' of ', ''))) / 4 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' to ', ''))) / 4 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' and ', ''))) / 5 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' in ', ''))) / 4 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' is ', ''))) / 4 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' it ', ''))) / 4 AS INT) AS n_stopwords,
              FLOOR(CAST(
                CASE WHEN length(text) BETWEEN 50 AND 100000 THEN 0.4 ELSE 0.0 END
                + CASE WHEN len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                         / greatest(length(text), 1) < 0.1 THEN 0.3 ELSE 0.0 END
                + CASE WHEN (CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' the ', ''))) / 5 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' a ', ''))) / 3 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' of ', ''))) / 4 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' to ', ''))) / 4 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' and ', ''))) / 5 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' in ', ''))) / 4 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' is ', ''))) / 4 AS INT) + CAST((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' it ', ''))) / 4 AS INT)) > 0 THEN 0.3 ELSE 0.0 END
              AS DOUBLE) * 100.0 + 0.5) / 100.0 AS quality
       FROM documents
