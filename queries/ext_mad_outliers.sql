-- ext_mad_outliers: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH m AS (
         SELECT l_returnflag AS g, quantile_cont(l_extendedprice, 0.5) AS med
         FROM lineitem GROUP BY l_returnflag
       ),
       d AS (
         SELECT l.l_returnflag, l.l_extendedprice AS v, m.med
         FROM lineitem l JOIN m ON l.l_returnflag = m.g
       ),
       s AS (
         SELECT l_returnflag AS g, quantile_cont(abs(v - med), 0.5) AS mad
         FROM d GROUP BY l_returnflag
       )
       SELECT d.l_returnflag,
              round(any_value(d.med), 4) AS median,
              round(any_value(s.mad), 4) AS mad,
              round(any_value(s.mad) * 1.4826, 4) AS robust_sigma,
              COUNT(*) FILTER (WHERE abs(d.v - d.med) > 3.0 * (s.mad * 1.4826)) AS n_outliers,
              COUNT(*) AS n_rows
       FROM d JOIN s ON d.l_returnflag = s.g
       GROUP BY d.l_returnflag
