-- ext_quality_gate: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH th AS (SELECT lang, quantile_cont(n_chars, 0.5) AS gate
                   FROM documents GROUP BY lang)
       SELECT d.doc_id, d.lang, d.n_chars, th.gate
       FROM documents d JOIN th ON d.lang = th.lang
       WHERE d.n_chars >= th.gate
