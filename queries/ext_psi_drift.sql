-- ext_psi_drift: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH stats AS (
         SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents),
       bk AS (
         SELECT lang AS g,
                CAST(CASE WHEN s.mx = s.mn THEN 0
                     ELSE least(9, floor((n_chars - s.mn) * 10.0 / (s.mx - s.mn)))
                END AS INT) AS b
         FROM documents, stats s),
       p AS (SELECT b, COUNT(*) AS cp FROM bk GROUP BY b),
       q AS (SELECT g, b, COUNT(*) AS cq FROM bk GROUP BY g, b),
       ng AS (SELECT g, COUNT(*) AS n_g FROM bk GROUP BY g),
       tot AS (SELECT COUNT(*) AS n_tot FROM bk),
       grid AS (
         SELECT DISTINCT bk.g, r.range AS b
         FROM bk, range(0, 10) r),
       terms AS (
         SELECT grid.g,
                (COALESCE(q.cq, 0) + 0.5) / (ng.n_g + 5.0) AS qb,
                (COALESCE(p.cp, 0) + 0.5) / (tot.n_tot + 5.0) AS pb
         FROM grid
         LEFT JOIN q ON grid.g = q.g AND grid.b = q.b
         LEFT JOIN p ON grid.b = p.b
         JOIN ng ON grid.g = ng.g
         CROSS JOIN tot)
       SELECT g AS lang,
              floor(SUM((qb - pb) * ln(qb / pb)) * 1e6 + 0.5) / 1e6 AS psi
       FROM terms GROUP BY g
