-- ext_heavy_hitters: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
         SELECT string_split_regex(lower(trim(text)), '\s+') AS ws
         FROM documents),
       tri AS (
         SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
         FROM words, LATERAL (
           SELECT unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i) t),
       tot AS (SELECT COUNT(*) AS n_total FROM tri)
       SELECT g, COUNT(*) AS cnt
       FROM tri, tot GROUP BY g, n_total
       HAVING COUNT(*) * 5000 >= n_total
