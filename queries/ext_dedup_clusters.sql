-- ext_dedup_clusters: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH RECURSIVE
          words AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
            FROM documents),
          sh_raw AS (
            SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
            FROM words, LATERAL (
              SELECT unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i) t),
          -- mirror the Spark leg's MAX_SHINGLE_DF=1000 hot-shingle cap
          -- (dedup.drop_hot_keys): shingles in >1000 docs leave the
          -- shingle universe BEFORE sizing and pairing
          sh AS (
            SELECT doc_id, s FROM sh_raw
            WHERE s IN (SELECT s FROM sh_raw GROUP BY s HAVING COUNT(*) <= 1000)),
          sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          common AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
          pairs AS (
            SELECT d1, d2 FROM common
            JOIN sizes sa ON sa.doc_id = d1
            JOIN sizes sb ON sb.doc_id = d2
            WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.2),
          edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                    UNION SELECT d2, d1 FROM pairs),
          reach(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
        SELECT src AS doc_id,
               least(src, min(dst)) AS cluster_id,
               src = least(src, min(dst)) AS keep
        FROM reach GROUP BY src
