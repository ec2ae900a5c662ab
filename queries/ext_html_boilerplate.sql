-- ext_html_boilerplate: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT doc_id,
               CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = ''
                    THEN lang
                    ELSE lang || chr(10)
                         || trim(regexp_replace(text, '\s+', ' ', 'g'))
               END AS text
        FROM documents
