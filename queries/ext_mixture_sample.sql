-- ext_mixture_sample: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH w AS (SELECT * FROM (VALUES ('src0', 3.0), ('src1', 1.0),
                                        ('src2', 1.0), ('src3', 2.0))
                  AS t(source, w)),
         counts AS (SELECT d.source, COUNT(*) AS n, ANY_VALUE(w.w) AS w
                    FROM documents d JOIN w ON d.source = w.source
                    GROUP BY d.source),
         binding AS (SELECT MIN(n / w) AS scale FROM counts),
         rates AS (SELECT source,
                          CAST(FLOOR(10000.0 * scale * w / n + 0.000001) AS BIGINT)
                            AS keep_lt
                   FROM counts, binding)
       SELECT d.doc_id, d.source
       FROM documents d JOIN rates r ON d.source = r.source
       WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 10000 < r.keep_lt
