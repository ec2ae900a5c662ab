-- ext_emb_quantize: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
      s AS (SELECT vec_id, x, list_min(x) AS mn, list_max(x) AS mx,
                   CASE WHEN list_max(x) > list_min(x)
                        THEN (list_max(x) - list_min(x)) / 255.0
                        ELSE 1.0 END AS scale
            FROM v),
      c AS (SELECT vec_id, x, mn, mx, scale,
                   list_transform(x, e -> CAST(floor((e - mn) / scale + 0.5) AS INT)) AS codes
            FROM s)
     SELECT vec_id, CAST(len(x) AS BIGINT) AS n_dims, mn AS v_min, mx AS v_max,
            CAST(list_sum(codes) AS BIGINT) AS code_sum,
            md5(array_to_string(list_transform(codes, e -> CAST(e AS VARCHAR)), ',')) AS code_md5,
            list_max(list_transform(range(1, len(x) + 1),
                     i -> abs(x[i] - (mn + codes[i] * scale)))) AS max_abs_err
     FROM c
