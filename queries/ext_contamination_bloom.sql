-- ext_contamination_bloom: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH split AS (
          SELECT doc_id, text,
                 ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
          FROM documents),
        words AS (
          SELECT doc_id, bucket, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM split),
        sh AS (
          SELECT DISTINCT doc_id, bucket,
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
          FROM words, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i) t),
        hits AS (
          SELECT tr.doc_id, tr.s, te.doc_id AS bench_id
          FROM sh tr JOIN sh te ON tr.s = te.s
          WHERE tr.bucket < 90 AND te.bucket >= 90)
       SELECT doc_id,
              COUNT(DISTINCT s) AS n_shared_shingles,
              COUNT(DISTINCT bench_id) AS n_bench_docs
       FROM hits GROUP BY doc_id
