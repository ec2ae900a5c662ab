-- ext_html_boilerplate: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT doc_id,
               CASE WHEN trim(regexp_replace(t, '\s+', ' ', 'g')) = ''
                    THEN l
                    ELSE l || chr(10)
                         || trim(regexp_replace(t, '\s+', ' ', 'g'))
               END AS text
        FROM (SELECT doc_id,
                     trim(regexp_replace(regexp_replace(
                       lang, '[\x{0b}\x{1c}-\x{1f}\x{85}\x{a0}\x{1680}\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]', ' ', 'g'), '\s+', ' ', 'g')) AS l,
                     regexp_replace(text, '[\x{0b}\x{1c}-\x{1f}\x{85}\x{a0}\x{1680}\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]', ' ', 'g') AS t
              FROM documents)
