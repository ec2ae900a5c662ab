-- ext_mmr_diversify: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH RECURSIVE
 q AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
       WHERE vec_id < 10),
 c AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
 scored AS (
   SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          FLOOR(list_cosine_similarity(q.emb, c.emb) * 10000.0 + 0.5)
            / 10000.0 AS rel
   FROM q JOIN c ON q.vec_id <> c.vec_id),
 pool AS (
   SELECT * FROM (
     SELECT query_id, neighbor_id, rel,
            ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rel DESC, neighbor_id) AS rnk
     FROM scored) ranked WHERE rnk <= 24),
 pairs AS (
   SELECT a.query_id, a.neighbor_id AS i, b.neighbor_id AS j,
          FLOOR(list_cosine_similarity(ea.emb, eb.emb) * 10000.0 + 0.5)
            / 10000.0 AS s
   FROM pool a JOIN pool b ON a.query_id = b.query_id
                          AND a.neighbor_id <> b.neighbor_id
   JOIN c ea ON ea.vec_id = a.neighbor_id
   JOIN c eb ON eb.vec_id = b.neighbor_id),
 sel AS (
   SELECT query_id, 1 AS step, neighbor_id AS picked,
          0.7 * rel AS mmr, [neighbor_id] AS sel_ids
   FROM pool WHERE rnk = 1
   UNION ALL
   SELECT s.query_id, s.step + 1, nxt.neighbor_id, nxt.mmr,
          list_append(s.sel_ids, nxt.neighbor_id)
   FROM sel s, LATERAL (
     SELECT p.neighbor_id,
            0.7 * p.rel - 0.30000000000000004 * (
              SELECT MAX(pr.s) FROM pairs pr
              WHERE pr.query_id = p.query_id AND pr.i = p.neighbor_id
                AND list_contains(s.sel_ids, pr.j)) AS mmr
     FROM pool p
     WHERE p.query_id = s.query_id
       AND NOT list_contains(s.sel_ids, p.neighbor_id)
     ORDER BY mmr DESC, p.neighbor_id
     LIMIT 1) nxt
   WHERE s.step < 8)
SELECT query_id, picked AS neighbor_id, step AS mmr_rank,
       FLOOR(mmr * 10000.0 + 0.5) / 10000.0 AS mmr_score
FROM sel
