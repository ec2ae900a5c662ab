-- ext_pack_emit: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH t AS (
         SELECT doc_id,
                CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                     ELSE string_split_regex(trim(text), '\s+') END AS w
         FROM documents),
       c AS (
         SELECT doc_id, w, len(w) AS tokens,
                CAST(COALESCE(SUM(len(w)) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS start_off
         FROM t),
       spans AS (
         SELECT s.s AS seq_id,
                greatest(s.s * 512, start_off) - s.s * 512 AS off,
                w[CAST(greatest(s.s * 512, start_off) - start_off + 1 AS BIGINT)
                  : CAST(least((s.s + 1) * 512, start_off + tokens) - start_off AS BIGINT)]
                  AS chunk
         FROM c, LATERAL (
           SELECT unnest(generate_series(start_off // 512,
                                         (start_off + tokens - 1) // 512)) AS s) s
         WHERE tokens > 0)
       SELECT seq_id,
              array_to_string(flatten(list(chunk ORDER BY off)), ' ') AS tokens,
              CAST(len(flatten(list(chunk ORDER BY off))) AS BIGINT) AS n_tokens
       FROM spans GROUP BY seq_id
