-- ext_dedup_minhash: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM words, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i) t),
        hx AS (
          SELECT doc_id, ('0x' || substring(md5(s), 1, 8))::BIGINT AS x
          FROM sh),
        sig AS (
          SELECT doc_id, MIN((686579304 * x + 906070220) % 4294967311) AS h0, MIN((119540832 * x + 68252793) % 4294967311) AS h1, MIN((26855093 * x + 63989047) % 4294967311) AS h2, MIN((796233791 * x + 201209005) % 4294967311) AS h3, MIN((295310486 * x + 469521477) % 4294967311) AS h4, MIN((262950629 * x + 499635468) % 4294967311) AS h5, MIN((239670712 * x + 56985561) % 4294967311) AS h6, MIN((149827707 * x + 427000596) % 4294967311) AS h7, MIN((790779947 * x + 900911954) % 4294967311) AS h8, MIN((110053354 * x + 473392624) % 4294967311) AS h9, MIN((726600540 * x + 964669077) % 4294967311) AS h10, MIN((795285933 * x + 597409992) % 4294967311) AS h11, MIN((957970517 * x + 13955983) % 4294967311) AS h12, MIN((585582862 * x + 342865762) % 4294967311) AS h13, MIN((93349857 * x + 907557512) % 4294967311) AS h14, MIN((634036507 * x + 730682427) % 4294967311) AS h15
          FROM hx GROUP BY doc_id),
        cand AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2
          FROM sig a JOIN sig b
            ON a.doc_id < b.doc_id AND ((a.h0 = b.h0 AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3) OR (a.h4 = b.h4 AND a.h5 = b.h5 AND a.h6 = b.h6 AND a.h7 = b.h7) OR (a.h8 = b.h8 AND a.h9 = b.h9 AND a.h10 = b.h10 AND a.h11 = b.h11) OR (a.h12 = b.h12 AND a.h13 = b.h13 AND a.h14 = b.h14 AND a.h15 = b.h15))),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (
          SELECT c.d1, c.d2, COUNT(*) AS cnt
          FROM cand c
          JOIN sh s1 ON s1.doc_id = c.d1
          JOIN sh s2 ON s2.doc_id = c.d2 AND s2.s = s1.s
          GROUP BY c.d1, c.d2)
        SELECT d1, d2,
               FLOOR(cnt * 1.0 / (sa.n + sb.n - cnt) * 10000.0 + 0.5) / 10000.0
                 AS jaccard_verified
        FROM common
        JOIN sizes sa ON sa.doc_id = d1
        JOIN sizes sb ON sb.doc_id = d2
        WHERE cnt * 1.0 / (sa.n + sb.n - cnt) >= 0.2
