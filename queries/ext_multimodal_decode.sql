-- ext_multimodal_decode: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT doc_id,
              CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'wav' END AS kind,
              CASE WHEN doc_id % 3 < 2 THEN 4 + doc_id % 29 END AS width,
              CASE WHEN doc_id % 3 < 2 THEN 4 + doc_id % 17 END AS height,
              CASE WHEN doc_id % 3 = 2 THEN (400 + (doc_id % 50) * 80) // 8 END AS duration_ms
       FROM documents
