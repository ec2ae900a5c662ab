-- ext_multimodal_meta: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT doc_id,
              octet_length(encode(text)) AS n_bytes,
              substring(hex(encode(text)), 1, 16) AS header_hex
       FROM documents
