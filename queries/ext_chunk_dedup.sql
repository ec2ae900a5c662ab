-- ext_chunk_dedup: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH w AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
        c AS (
          SELECT doc_id,
                 unnest(range(0, CAST(ceil(len(words)/10.0) AS BIGINT))) AS pos,
                 words
          FROM w),
        hs AS (
          SELECT doc_id, pos,
                 md5(array_to_string(words[(pos*10+1):(pos*10+10)], ' ')) AS h,
                 doc_id*1000000 + pos AS k
          FROM c),
        win AS (SELECT h, min(k) AS k_min FROM hs GROUP BY h)
        SELECT doc_id,
               COUNT(*) AS n_chunks,
               COUNT(*) FILTER (WHERE k = k_min) AS n_kept,
               COUNT(*) - COUNT(*) FILTER (WHERE k = k_min) AS n_dup
        FROM hs JOIN win USING (h)
        GROUP BY doc_id
