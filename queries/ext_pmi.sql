-- ext_pmi: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        uni AS (
          SELECT word, COUNT(*) AS c1 FROM (
            SELECT doc_id, unnest(w) AS word FROM words)
          GROUP BY word),
        n_uni AS (SELECT SUM(c1) AS n1 FROM uni),
        bg AS (
          SELECT w[i] AS l, w[i+1] AS r
          FROM words, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i) t),
        bgc AS (SELECT l, r, COUNT(*) AS c2 FROM bg GROUP BY l, r),
        n_bg AS (SELECT SUM(c2) AS n2 FROM bgc)
       SELECT l, r, c2,
              FLOOR(ln((c2 * 1.0 / n2) / ((ca.c1 * 1.0 / n1) * (cb.c1 * 1.0 / n1)))
                    * 10000.0 + 0.5) / 10000.0 AS pmi
       FROM bgc
       JOIN uni ca ON ca.word = bgc.l
       JOIN uni cb ON cb.word = bgc.r
       CROSS JOIN n_uni CROSS JOIN n_bg
       WHERE c2 >= 5
