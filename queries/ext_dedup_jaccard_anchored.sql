-- ext_dedup_jaccard_anchored: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        sh0 AS (
          SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM words, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i) t),
        hot AS (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) > 1000),
        sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS big, b.doc_id AS anc, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id > b.doc_id
          WHERE b.doc_id % 10 < 2
          GROUP BY 1, 2)
        SELECT big AS d1, anc AS d2,
               FLOOR(c * 1.0 / (sa.n + sb.n - c) * 10000.0 + 0.5) / 10000.0 AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = big
        JOIN sizes sb ON sb.doc_id = anc
        WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.2
