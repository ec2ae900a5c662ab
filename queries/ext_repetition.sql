-- ext_repetition: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        base AS (
          SELECT doc_id,
                 greatest(len(w) - 2, 0) AS n3_total,
                 len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                     for i in generate_series(1, greatest(len(w) - 2, 0))])) AS n3_distinct
          FROM words),
        tf AS (
          SELECT doc_id, word, COUNT(*) AS c
          FROM (SELECT doc_id, unnest(w) AS word FROM words)
          GROUP BY doc_id, word),
        top AS (SELECT doc_id, MAX(c) AS max_c, SUM(c) AS nw FROM tf GROUP BY doc_id),
        m AS (
          SELECT b.doc_id,
                 CASE WHEN b.n3_total = 0 THEN 0.0
                      ELSE 1.0 - b.n3_distinct * 1.0 / b.n3_total END AS dup3,
                 t.max_c * 1.0 / t.nw AS topf
          FROM base b JOIN top t ON b.doc_id = t.doc_id)
       SELECT doc_id,
              FLOOR(dup3 * 10000.0 + 0.5) / 10000.0 AS dup3_frac,
              FLOOR(topf * 10000.0 + 0.5) / 10000.0 AS top_word_frac,
              (dup3 <= 0.5 AND topf <= 0.2) AS keep
       FROM m
