-- ext_line_dedup: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH base AS (
          SELECT doc_id, string_split(text, ' ') AS words,
                 5 + doc_id % 7 AS k
          FROM documents),
        lined AS (
          SELECT doc_id, k,
                 list_transform(
                   range(0, CAST(ceil(len(words) / (k * 1.0)) AS INT)),
                   i -> array_to_string(words[i*k+1 : i*k+k], ' ') ||
                        CASE WHEN (i + doc_id) % 3 = 0 THEN '' ELSE '.' END
                 ) AS lines
          FROM base),
        paged AS (
          SELECT doc_id,
                 array_to_string(lines, chr(10))
                 || CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'Lorem ipsum dolor sit amet.' ELSE '' END
                 || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'function f() { return 0; }' ELSE '' END
                 || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'Please enable JavaScript to continue.' ELSE '' END
                 || CASE WHEN doc_id % 7 = 0 THEN chr(10) || lines[1] || chr(10) || lines[1] ELSE '' END
                 AS page
          FROM lined),
        docs AS (
          SELECT doc_id,
                 list_filter(string_split(page, chr(10)), x -> trim(x) <> '') AS lines
          FROM paged),
        inst AS (
          SELECT doc_id, pos, lines[pos] AS line,
                 md5(regexp_replace(regexp_replace(lower(trim(lines[pos])), '[0-9]', '0', 'g'), '\s+', ' ', 'g')) AS fp
          FROM docs, LATERAL unnest(generate_series(1, len(lines))) AS t(pos)),
        tagged AS (
          SELECT doc_id, pos, line,
                 row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) = 1 AS kept
          FROM inst)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               floor((1.0 - SUM(CASE WHEN kept THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS dup_frac,
               COALESCE(string_agg(CASE WHEN kept THEN line END, chr(10) ORDER BY pos), '') AS clean_text
        FROM tagged GROUP BY doc_id
