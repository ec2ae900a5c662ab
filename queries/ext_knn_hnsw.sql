-- ext_knn_hnsw: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
                  WHERE vec_id < 10),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 FLOOR(list_cosine_similarity(q.emb, c.emb) * 10000.0 + 0.5)
                   / 10000.0 AS score
          FROM q JOIN c ON q.vec_id <> c.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id, score,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, rank, score
        FROM ranked WHERE rank <= 10
