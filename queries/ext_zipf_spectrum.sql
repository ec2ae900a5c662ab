-- ext_zipf_spectrum: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
         SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
         FROM documents),
       vocab AS (SELECT w, COUNT(*) AS c FROM words WHERE w <> '' GROUP BY w),
       spec AS (SELECT c AS freq, COUNT(*) AS n_words FROM vocab GROUP BY c),
       ranked AS (
         SELECT freq, n_words,
                COALESCE(SUM(n_words) OVER (ORDER BY freq DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + (n_words + 1) / 2.0 AS rank_mid
         FROM spec),
       fit AS (
         SELECT (SUM(n_words * ln(rank_mid) * ln(freq))
                 - SUM(n_words * ln(rank_mid)) * SUM(n_words * ln(freq))
                   / SUM(n_words))
              / (SUM(n_words * ln(rank_mid) * ln(rank_mid))
                 - SUM(n_words * ln(rank_mid)) * SUM(n_words * ln(rank_mid))
                   / SUM(n_words)) AS slope
         FROM ranked)
       SELECT CAST(freq AS BIGINT) AS freq,
              CAST(n_words AS BIGINT) AS n_words,
              rank_mid,
              FLOOR(slope * 10000.0 + 0.5) / 10000.0 AS zipf_slope
       FROM ranked, fit
