-- ext_winnow_pairs: DuckDB oracle (ANSI SQL over the shared parquet views).
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
          FROM hashes WHERE len(h) >= 5),
        fp0 AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM wins),
        hot AS (SELECT fp FROM fp0 GROUP BY fp HAVING COUNT(*) > 1000),
        fp AS (SELECT * FROM fp0 WHERE fp NOT IN (SELECT fp FROM hot)),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM fp GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
          FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
       SELECT d1, d2, shared,
              FLOOR(shared * 1.0 / least(sa.n, sb.n) * 10000.0 + 0.5) / 10000.0
                AS overlap
       FROM common
       JOIN sizes sa ON sa.doc_id = d1
       JOIN sizes sb ON sb.doc_id = d2
       WHERE shared * 1.0 / least(sa.n, sb.n) >= 0.5
