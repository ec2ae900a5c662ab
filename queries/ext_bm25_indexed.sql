-- ext_bm25_indexed: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
          SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
          FROM documents),
        tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
        stats AS (SELECT AVG(dl * 1.0) AS avgdl, COUNT(*) AS n FROM dl),
        dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM words
                  WHERE w IN ('spark', 'table', 'merge') GROUP BY w),
        scores AS (
          SELECT tf.doc_id, tf.w,
                 ln((n - df + 0.5) / (df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
          FROM tf
          JOIN dfreq ON tf.w = dfreq.w
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN stats),
        pivoted AS (
          SELECT doc_id,
                 COALESCE(SUM(CASE WHEN w = 'spark' THEN s END), 0.0) AS s1,
                 COALESCE(SUM(CASE WHEN w = 'table' THEN s END), 0.0) AS s2,
                 COALESCE(SUM(CASE WHEN w = 'merge' THEN s END), 0.0) AS s3
          FROM scores GROUP BY doc_id)
       SELECT doc_id,
              FLOOR((s1 + s2 + s3) * 10000.0 + 0.5) / 10000.0 AS bm25
       FROM pivoted
       ORDER BY (s1 + s2 + s3) DESC, doc_id LIMIT 20
