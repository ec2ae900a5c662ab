-- ext_winsorize: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH p AS (
         SELECT l_returnflag AS g,
                quantile_cont(l_extendedprice, 0.01) AS p_lo,
                quantile_cont(l_extendedprice, 0.99) AS p_hi
         FROM lineitem GROUP BY l_returnflag
       )
       SELECT l.l_returnflag,
              round(any_value(p.p_lo), 4) AS p_lo,
              round(any_value(p.p_hi), 4) AS p_hi,
              COUNT(*) FILTER (WHERE l_extendedprice < p.p_lo) AS n_clip_lo,
              COUNT(*) FILTER (WHERE l_extendedprice > p.p_hi) AS n_clip_hi,
              round(avg(l_extendedprice), 4) AS mean_raw,
              round(avg(CASE WHEN l_extendedprice < p.p_lo THEN p.p_lo
                             WHEN l_extendedprice > p.p_hi THEN p.p_hi
                             ELSE l_extendedprice END), 4) AS mean_winsorized
       FROM lineitem l JOIN p ON l.l_returnflag = p.g
       GROUP BY l.l_returnflag
