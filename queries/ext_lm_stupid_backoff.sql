-- ext_lm_stupid_backoff: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH toks AS (
          SELECT doc_id, doc_id % 2 = 0 AS is_ref,
                 string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        grams AS (
          SELECT doc_id, is_ref, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 0))) AS i) t),
        tri AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM grams WHERE is_ref GROUP BY 1,2,3),
        bi  AS (SELECT w1, w2, COUNT(*) AS c2 FROM grams WHERE is_ref GROUP BY 1,2),
        uni AS (SELECT w1, COUNT(*) AS c1 FROM grams WHERE is_ref GROUP BY 1),
        tot AS (SELECT CAST(SUM(c1) AS DOUBLE) AS n_tot FROM uni)
        SELECT g.doc_id,
               COUNT(*) AS n_trigrams,
               any_value(g.is_ref) AS in_ref,
               floor(AVG(
                 CASE
                   WHEN tri.c3 IS NOT NULL THEN ln(tri.c3 / (bi.c2 * 1.0))
                   WHEN bo.c2 IS NOT NULL THEN ln(0.4 * bo.c2 / (bu.c1 * 1.0))
                   ELSE ln(0.4 * 0.4 * coalesce(u3.c1, 0.5) / tot.n_tot)
                 END) * 10000.0 + 0.5) / 10000.0 AS avg_logscore
        FROM grams g
        LEFT JOIN tri ON g.w1 = tri.w1 AND g.w2 = tri.w2 AND g.w3 = tri.w3
        LEFT JOIN bi  ON g.w1 = bi.w1 AND g.w2 = bi.w2
        LEFT JOIN bi bo ON g.w2 = bo.w1 AND g.w3 = bo.w2
        LEFT JOIN uni bu ON g.w2 = bu.w1
        LEFT JOIN uni u3 ON g.w3 = u3.w1
        CROSS JOIN tot
        GROUP BY g.doc_id
