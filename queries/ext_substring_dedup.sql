-- ext_substring_dedup: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        grams AS (
          SELECT doc_id, i AS pos,
                 md5(list_aggregate(w[i:i+7], 'string_agg', ' ')) AS g
          FROM words, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i) t),
        dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
        occ AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
        flagged AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                      <= 8 THEN 0 ELSE 1 END AS new_island
          FROM occ),
        islands AS (
          SELECT doc_id, pos,
                 SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM flagged)
       SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
              MAX(pos) + 7 - MIN(pos) + 1 AS n_words
       FROM islands GROUP BY doc_id, island
