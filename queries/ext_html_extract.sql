-- ext_html_extract: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT doc_id,
               trim(regexp_replace(
                 regexp_replace(html, '<[^>]*>', ' ', 'g'),
                 '\s+', ' ', 'g')) AS text
        FROM (SELECT doc_id,
                     '<html><head><title>doc</title></head><body><nav><a href="/">home</a> <a href="/about">about</a></nav><h1>'
                     || regexp_replace(lang, '[\x{0b}\x{1c}-\x{1f}\x{85}\x{a0}\x{1680}\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]', ' ', 'g')
                     || '</h1><div class="content"><p>'
                     || regexp_replace(text, '[\x{0b}\x{1c}-\x{1f}\x{85}\x{a0}\x{1680}\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]', ' ', 'g')
                     || '</p></div><footer>contact us</footer></body></html>' AS html
              FROM documents)
