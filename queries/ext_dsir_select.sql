-- ext_dsir_select: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH split AS (
          SELECT doc_id, text,
                 ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
          FROM documents),
        rw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
               FROM split WHERE bucket < 90),
        tw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
               FROM split WHERE bucket >= 90),
        rg AS (SELECT doc_id,
                      ('0x' || substring(md5(g), 1, 8))::BIGINT % 1024 AS b
               FROM (SELECT doc_id,
                            unnest(list_concat(w,
                              CASE WHEN len(w) >= 2
                              THEN list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i + 1])
                              ELSE CAST([] AS VARCHAR[]) END)) AS g
                     FROM rw)),
        tg AS (SELECT ('0x' || substring(md5(g), 1, 8))::BIGINT % 1024 AS b
               FROM (SELECT unnest(list_concat(w,
                              CASE WHEN len(w) >= 2
                              THEN list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i + 1])
                              ELSE CAST([] AS VARCHAR[]) END)) AS g
                     FROM tw)),
        qc AS (SELECT b, COUNT(*) AS c FROM rg GROUP BY b),
        pc AS (SELECT b, COUNT(*) AS c FROM tg GROUP BY b),
        tot AS (SELECT (SELECT COUNT(*) FROM rg) AS qn,
                       (SELECT COUNT(*) FROM tg) AS pn),
        lr AS (SELECT qc.b,
                      ln((COALESCE(pc.c, 0) + 1.0) / (pn + 1024))
                      - ln((qc.c + 1.0) / (qn + 1024)) AS lr
               FROM qc LEFT JOIN pc USING (b), tot),
        scored AS (
          SELECT rg.doc_id,
                 FLOOR((SUM(lr.lr)
                        - ln(-ln((('0x' || substring(md5(CAST(rg.doc_id AS VARCHAR)), 1, 8))::BIGINT
                                  % 1000000 + 0.5) / 1000000.0)))
                       * 10000.0 + 0.5) / 10000.0 AS score
          FROM rg JOIN lr USING (b)
          GROUP BY rg.doc_id),
        gate AS (SELECT quantile_cont(score, 0.75) AS gate FROM scored)
       SELECT doc_id, score, gate FROM scored, gate WHERE score >= gate
