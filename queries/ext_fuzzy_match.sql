-- ext_fuzzy_match: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH p AS (SELECT DISTINCT p_name FROM part),
         b0 AS (SELECT p_name,
                       regexp_extract(p_name, '([a-z]+)$', 1) AS blk
                FROM p),
         hot AS (SELECT blk FROM b0 GROUP BY blk
                 HAVING COUNT(*) > 500),
         b AS (SELECT p_name,
                      CASE WHEN blk IN (SELECT blk FROM hot)
                           THEN blk || '|' || substring(p_name, 1, 1)
                           ELSE blk END AS blk
               FROM b0)
       SELECT a.p_name AS n1, c.p_name AS n2,
              levenshtein(a.p_name, c.p_name) AS dist
       FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
       WHERE levenshtein(a.p_name, c.p_name) BETWEEN 1 AND 3
