-- ext_export_shards: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard,
              COUNT(*) AS n_samples,
              CAST(SUM(strlen(text)) AS BIGINT) AS payload_bytes
       FROM documents GROUP BY shard
