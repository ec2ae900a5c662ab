-- ext_hybrid_search: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
          SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
          FROM documents WHERE doc_id <> 0),
        tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
        stats AS (SELECT AVG(dl * 1.0) AS avgdl, COUNT(*) AS n FROM dl),
        dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM words
                  WHERE w IN ('spark', 'table', 'merge') GROUP BY w),
        s AS (
          SELECT tf.doc_id,
                 ln((n - df + 0.5) / (df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS sc,
                 tf.w
          FROM tf JOIN dfreq ON tf.w = dfreq.w
          JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
        lex0 AS (
          SELECT doc_id,
                 COALESCE(SUM(CASE WHEN w = 'spark' THEN sc END), 0.0)
                 + COALESCE(SUM(CASE WHEN w = 'table' THEN sc END), 0.0)
                 + COALESCE(SUM(CASE WHEN w = 'merge' THEN sc END), 0.0) AS bm25
          FROM s GROUP BY doc_id),
        lex AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY FLOOR(bm25 * 10000.0 + 0.5) / 10000.0 DESC,
                                    doc_id) AS r_lex
          FROM lex0),
        qv AS (SELECT embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id = 0),
        vec0 AS (
          SELECT c.vec_id,
                 FLOOR(list_cosine_similarity(qv.emb, c.embedding::DOUBLE[]) * 10000.0 + 0.5)
                   / 10000.0 AS cos
          FROM embeddings c, qv WHERE c.vec_id <> 0),
        vec AS (
          SELECT vec_id,
                 ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS r_vec
          FROM vec0),
        fused AS (
          SELECT COALESCE(l.doc_id, v.vec_id) AS doc_id, l.r_lex, v.r_vec,
                 COALESCE(1.0 / (60 + l.r_lex), 0.0)
                 + COALESCE(1.0 / (60 + v.r_vec), 0.0) AS rrf
          FROM (SELECT * FROM lex WHERE r_lex <= 50) l
          FULL OUTER JOIN (SELECT * FROM vec WHERE r_vec <= 50) v
            ON l.doc_id = v.vec_id)
        SELECT doc_id, r_lex, r_vec,
               FLOOR(rrf * 1000000.0 + 0.5) / 1000000.0 AS rrf
        FROM fused
        ORDER BY rrf DESC, doc_id LIMIT 20
