-- ext_fuzzy_match: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH p AS (SELECT DISTINCT p_name FROM part),
         b0 AS (SELECT p_name, regexp_extract(p_name, '([a-z]+)$', 1) AS blk FROM p),
         hot1 AS (SELECT blk FROM b0 GROUP BY blk HAVING COUNT(*) > 500),
         b1 AS (SELECT p_name, CASE WHEN blk IN (SELECT blk FROM hot1) THEN blk || '|' || substring(p_name, 1, 1) ELSE blk END AS blk FROM b0),
         hot2 AS (SELECT blk FROM b1 GROUP BY blk HAVING COUNT(*) > 500),
         b2 AS (SELECT p_name, CASE WHEN blk IN (SELECT blk FROM hot2) THEN blk || '|' || substring(p_name, 2, 1) ELSE blk END AS blk FROM b1),
         hot3 AS (SELECT blk FROM b2 GROUP BY blk HAVING COUNT(*) > 500),
         b3 AS (SELECT p_name, CASE WHEN blk IN (SELECT blk FROM hot3) THEN blk || '|' || substring(p_name, 3, 1) ELSE blk END AS blk FROM b2)
       SELECT a.p_name AS n1, c.p_name AS n2,
              levenshtein(a.p_name, c.p_name) AS dist
       FROM b3 a JOIN b3 c
         ON a.blk = c.blk AND a.p_name < c.p_name
       WHERE levenshtein(a.p_name, c.p_name) BETWEEN 1 AND 3
