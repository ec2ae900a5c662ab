-- ext_ks_drift: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH counts AS (
         SELECT lang AS g, n_chars AS v, COUNT(*) AS cg
         FROM documents GROUP BY 1, 2),
       tot AS (SELECT v, SUM(cg) AS ct FROM counts GROUP BY v),
       ng AS (SELECT g, SUM(cg) AS n_g FROM counts GROUP BY g),
       n_tot AS (SELECT SUM(cg) AS n_tot FROM counts),
       grid AS (
         SELECT DISTINCT counts.g, tot.v FROM counts, tot),
       j AS (
         SELECT grid.g, grid.v, ng.n_g, n_tot.n_tot,
                COALESCE(counts.cg, 0) AS cg, tot.ct
         FROM grid
         LEFT JOIN counts ON grid.g = counts.g AND grid.v = counts.v
         JOIN tot ON grid.v = tot.v
         JOIN ng ON grid.g = ng.g
         CROSS JOIN n_tot),
       gaps AS (
         SELECT g, n_g,
                abs(
                  SUM(cg) OVER (PARTITION BY g ORDER BY v
                                ROWS UNBOUNDED PRECEDING) * 1.0 / n_g
                  - CASE WHEN n_tot > n_g THEN
                      SUM(ct - cg) OVER (PARTITION BY g ORDER BY v
                                         ROWS UNBOUNDED PRECEDING) * 1.0
                      / (n_tot - n_g)
                    END) AS gap
         FROM j)
       SELECT g AS lang,
              CAST(any_value(n_g) AS BIGINT) AS n_rows,
              floor(MAX(gap) * 1e6 + 0.5) / 1e6 AS ks
       FROM gaps GROUP BY g
