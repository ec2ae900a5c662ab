-- ext_embedding_centroids: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT label, i AS pos,
              FLOOR(AVG(embedding[i]) * 10000.0 + 0.5) / 10000.0 AS centroid
       FROM embeddings, LATERAL (
         SELECT unnest(generate_series(1, len(embedding))) AS i) t
       GROUP BY label, i
