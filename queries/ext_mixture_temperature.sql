-- ext_mixture_temperature: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         binding AS (SELECT MIN(n / pow(n, 0.5)) AS scale FROM counts),
         rates AS (SELECT lang,
                          CAST(FLOOR(10000.0 * scale * pow(n, 0.5) / n + 0.000001)
                            AS BIGINT) AS keep_lt
                   FROM counts, binding)
       SELECT d.doc_id, d.lang
       FROM documents d JOIN rates r ON d.lang = r.lang
       WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 10000 < r.keep_lt
