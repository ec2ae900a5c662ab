-- ext_fuzzy_decontam: DuckDB oracle (ANSI SQL over the shared parquet views).
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
        sizes AS (
          SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        hits AS (
          SELECT tr.doc_id, te.doc_id AS bench_id, COUNT(*) AS shared
          FROM sh tr JOIN sh te ON tr.s = te.s
          WHERE tr.bucket < 90 AND te.bucket >= 90
          GROUP BY tr.doc_id, te.doc_id)
        SELECT h.doc_id, h.bench_id,
               CAST(h.shared AS BIGINT) AS shared,
               floor(h.shared * 1.0 / (a.sz + b.sz - h.shared) * 10000.0 + 0.5) / 10000.0 AS jaccard,
               floor(h.shared * 1.0 / b.sz * 10000.0 + 0.5) / 10000.0 AS containment,
               h.shared * 1.0 / b.sz >= 0.5 AS contaminated
        FROM hits h
        JOIN sizes a ON h.doc_id = a.doc_id
        JOIN sizes b ON h.bench_id = b.doc_id
