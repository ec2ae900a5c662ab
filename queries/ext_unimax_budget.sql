-- ext_unimax_budget: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH sup AS (
      SELECT lang,
             CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END)
                  AS DOUBLE) AS s
      FROM documents GROUP BY lang),
    caps AS (SELECT lang, s, 1.2 * s AS cap FROM sup),
    tot AS (SELECT 0.8 * SUM(s) AS B FROM sup),
    ordered AS (
      SELECT lang, s, cap, B,
             ROW_NUMBER() OVER w AS k,
             COALESCE(SUM(cap) OVER (ORDER BY cap, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS p_prev,
             COUNT(*) OVER () AS L
      FROM caps, tot
      WINDOW w AS (ORDER BY cap, lang)),
    flagged AS (
      SELECT *, cap * (L - k + 1) + p_prev <= B AS capped
      FROM ordered),
    cagg AS (
      SELECT COALESCE(SUM(cap) FILTER (WHERE capped), 0) AS p_capped,
             COUNT(*) FILTER (WHERE capped) AS n_capped
      FROM flagged),
    rates AS (
      SELECT lang,
             CAST(FLOOR(
               (CASE WHEN s = 0 THEN 0
                     WHEN capped THEN cap
                     ELSE (B - p_capped) / (L - n_capped) END)
               / (CASE WHEN s = 0 THEN 1 ELSE s END)
               * 10000.0 + 0.000001) AS BIGINT) AS keep_total
      FROM flagged, cagg),
    docs AS (
      SELECT d.doc_id, d.lang,
             r.keep_total // 10000 AS full_ep,
             r.keep_total % 10000 AS rem,
             ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10000 AS bucket
      FROM documents d JOIN rates r USING (lang))
    SELECT doc_id, lang, CAST(epoch AS BIGINT) AS epoch
    FROM (SELECT doc_id, lang,
                 unnest(generate_series(1,
                   full_ep + (CASE WHEN bucket < rem THEN 1 ELSE 0 END)))
                   AS epoch
          FROM docs) t
