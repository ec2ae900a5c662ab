-- ext_url_stats: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH u AS (
         SELECT doc_id, n_chars,
                'https://WWW.Site' || CAST(doc_id % 37 AS VARCHAR)
                  || '.example.COM/p/' || CAST(doc_id % 100 AS VARCHAR)
                  || '/?utm=x' || CAST(doc_id AS VARCHAR) || '#frag' AS url
         FROM documents),
       c AS (
         SELECT doc_id, n_chars,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                  lower(url), '^https?://', ''), '^www\.', ''),
                  '[?#].*$', ''), '/$', '') AS canon
         FROM u)
       SELECT regexp_extract(canon, '^([^/]+)', 1) AS domain,
              COUNT(*) AS n_pages,
              COUNT(DISTINCT canon) AS n_unique_pages,
              CAST(SUM(n_chars) AS BIGINT) AS total_chars,
              MIN(canon) AS example_url
       FROM c GROUP BY 1
