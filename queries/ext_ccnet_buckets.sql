-- ext_ccnet_buckets: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
          SELECT doc_id, w[i] AS w1, w[i+1] AS w2
          FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                FROM documents),
               LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-1, 0))) AS i) t),
        uni AS (SELECT w1, COUNT(*) AS cu FROM words GROUP BY w1),
        bi AS (SELECT w1, w2, COUNT(*) AS cb FROM words GROUP BY w1, w2),
        v AS (SELECT COUNT(*) AS vocab FROM uni),
        scored AS (
          SELECT doc_id,
                 FLOOR(AVG(ln((cb + 1.0) / (cu + vocab))) * 10000.0 + 0.5) / 10000.0 AS avg_logprob
          FROM words JOIN bi USING (w1, w2) JOIN uni USING (w1), v
          GROUP BY doc_id),
        langd AS (
          SELECT s.doc_id, d.lang, s.avg_logprob
          FROM scored s JOIN documents d USING (doc_id)),
        th AS (
          SELECT lang,
                 floor(quantile_cont(avg_logprob, 1.0/3) * 10000.0 + 0.5) / 10000.0 AS t_low,
                 floor(quantile_cont(avg_logprob, 2.0/3) * 10000.0 + 0.5) / 10000.0 AS t_high
          FROM langd GROUP BY lang)
        SELECT l.doc_id, l.lang, l.avg_logprob,
               CASE WHEN l.avg_logprob >= th.t_high THEN 'head'
                    WHEN l.avg_logprob >= th.t_low THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM langd l JOIN th USING (lang)
