-- ext_tfidf: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
         SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
         FROM documents),
       tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w),
       dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY w),
       n AS (SELECT COUNT(*) AS n FROM documents)
       SELECT doc_id, w AS word, tf, df,
              FLOOR((tf * (ln((n + 1.0) / (df + 1.0)) + 1.0)) * 10000.0 + 0.5)
                / 10000.0 AS tfidf
       FROM tf JOIN dfreq USING (w), n
