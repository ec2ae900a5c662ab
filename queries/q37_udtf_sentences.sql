-- q37_udtf_sentences: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH sents AS (
          SELECT doc_id, string_split_regex(text, '[.!?]+') AS parts
          FROM documents)
        SELECT doc_id, i AS sent_idx,
               regexp_replace(parts[i], '^\s+|\s+$', '', 'g') AS sentence
        FROM sents, LATERAL (
          SELECT unnest(generate_series(1, len(parts))) AS i) t
        WHERE length(regexp_replace(parts[i], '^\s+|\s+$', '', 'g')) > 0
