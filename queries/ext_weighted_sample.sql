-- ext_weighted_sample: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH w AS (
          SELECT doc_id,
                 greatest(len(string_split_regex(trim(text), '\s+')), 1) * 1.0 AS weight
          FROM documents),
        keyed AS (
          SELECT doc_id, weight,
                 ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT + 0.5)
                    / 281474976710656.0) / weight AS es
          FROM w)
        SELECT doc_id, weight,
               floor(es * 1e8 + 0.5) / 1e8 AS es_key
        FROM keyed
        ORDER BY es DESC, doc_id
        LIMIT 100
