-- ext_dedup_embedding: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT a.vec_id AS v1, b.vec_id AS v2,
               FLOOR(list_cosine_similarity(a.embedding::DOUBLE[],
                     b.embedding::DOUBLE[]) * 10000.0 + 0.5) / 10000.0 AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= 0.35
