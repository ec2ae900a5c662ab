-- ext_redact: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH e AS (
          SELECT doc_id,
                 concat(text, ' contact user', CAST(doc_id % 50 AS VARCHAR), '@mail',
                        CAST(doc_id % 7 AS VARCHAR), '.example.com or visit https://site',
                        CAST(doc_id % 9 AS VARCHAR), '.net/p/', CAST(doc_id AS VARCHAR),
                        ' call +1-555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS enriched
          FROM documents)
        SELECT doc_id,
               len(regexp_extract_all(enriched, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_email,
               len(regexp_extract_all(enriched, 'https?://[^ ]+')) AS n_url,
               len(regexp_extract_all(enriched, '\+1-555-[0-9]{4}')) AS n_phone,
               regexp_replace(regexp_replace(regexp_replace(enriched,
                   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                   'https?://[^ ]+', '<URL>', 'g'),
                   '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS clean
        FROM e
