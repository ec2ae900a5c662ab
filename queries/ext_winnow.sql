-- ext_winnow: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH hashes AS (
          SELECT doc_id,
                 [ ('0x' || substring(md5(substring(lower(trim(text)), i, 8)), 1, 8))::BIGINT
                   for i in generate_series(1, greatest(length(lower(trim(text))) - 7, 0)) ] AS h
          FROM documents),
        wins AS (
          SELECT doc_id,
                 [ list_min(h[j+1:j+5])
                   for j in generate_series(0, len(h) - 5) ] AS fps
          FROM hashes
          WHERE len(h) >= 5)
       SELECT DISTINCT doc_id, unnest(fps) AS fp
       FROM wins
