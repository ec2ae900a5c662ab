-- ext_html_extract: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT doc_id,
               trim(regexp_replace(
                 regexp_replace(html, '<[^>]*>', ' ', 'g'),
                 '\s+', ' ', 'g')) AS text
        FROM (SELECT doc_id,
                     '<html><head><title>doc</title></head><body><nav><a href="/">home</a> <a href="/about">about</a></nav><h1>' || lang || '</h1><div class="content"><p>' || text
                     || '</p></div><footer>contact us</footer></body></html>' AS html
              FROM documents)
