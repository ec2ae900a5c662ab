-- ext_stratified_sample: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         target AS (SELECT MIN(n) AS min_n FROM counts),
         th AS (SELECT lang,
                       CAST(FLOOR(10000.0 * min_n / n) AS BIGINT) AS keep_lt
                FROM counts, target)
       SELECT d.doc_id, d.lang
       FROM documents d JOIN th ON d.lang = th.lang
       WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 10000 < th.keep_lt
