-- ext_substring_strip: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        grams AS (
          SELECT doc_id, i AS pos,
                 md5(list_aggregate(w[i:i+7], 'string_agg', ' ')) AS g
          FROM words, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i) t),
        later AS (
          SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
            FROM grams) WHERE rn > 1),
        flagged AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                      <= 8 THEN 0 ELSE 1 END AS new_island
          FROM later),
        islands AS (
          SELECT doc_id, pos,
                 SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM flagged),
        rm AS (
          SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
          FROM islands GROUP BY doc_id, island),
        wordpos AS (
          SELECT doc_id, i AS pos, w[i] AS word, len(w) AS n_orig
          FROM words, LATERAL (
            SELECT unnest(generate_series(1, len(w))) AS i) t),
        kept AS (
          SELECT wp.* FROM wordpos wp
          WHERE NOT EXISTS (SELECT 1 FROM rm
                            WHERE rm.doc_id = wp.doc_id
                              AND wp.pos BETWEEN rm.s AND rm.e)),
        rebuilt AS (
          SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text_clean,
                 COUNT(*) AS n_kept
          FROM kept GROUP BY doc_id),
        sizes AS (SELECT doc_id, len(w) AS n_orig FROM words)
       SELECT s.doc_id,
              COALESCE(r.text_clean, '') AS text_clean,
              COALESCE(r.n_kept, 0) AS n_kept,
              s.n_orig - COALESCE(r.n_kept, 0) AS n_removed
       FROM sizes s LEFT JOIN rebuilt r USING (doc_id)
