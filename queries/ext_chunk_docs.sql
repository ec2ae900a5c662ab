-- ext_chunk_docs: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH w AS (
         SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
         FROM documents WHERE length(trim(text)) > 0),
       c AS (
         SELECT doc_id, words,
                unnest(range(0, CASE WHEN len(words) <= 50 THEN 1
                                     ELSE (len(words) - 50 + 39) // 40 + 1 END)) AS chunk_id
         FROM w)
       SELECT doc_id, chunk_id,
              CAST(least(50, len(words) - (chunk_id * 40 + 1) + 1) AS INT) AS n_chunk_words,
              array_to_string(words[chunk_id * 40 + 1 : chunk_id * 40 + least(50, len(words) - (chunk_id * 40 + 1) + 1)], ' ') AS chunk
       FROM c
