-- ext_c4_rules: DuckDB oracle (ANSI SQL over the shared parquet views).
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
        stats AS (
          SELECT doc_id, page,
                 list_filter(string_split(page, chr(10)), x -> trim(x) <> '') AS lines
          FROM paged)
        SELECT doc_id,
               len(lines) AS n_lines,
               floor(CAST(len(list_filter(lines, x -> regexp_matches(x, '[.!?"]\s*$'))) AS DOUBLE) / len(lines) * 10000.0 + 0.5) / 10000.0 AS term_punct_ratio,
               floor(CAST(len(list_filter(lines, x -> len(string_split_regex(trim(x), '\s+')) < 3)) AS DOUBLE) / len(lines) * 10000.0 + 0.5) / 10000.0 AS short_line_frac,
               floor(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines) * 10000.0 + 0.5) / 10000.0 AS dup_line_frac,
               contains(lower(page), 'lorem ipsum') AS has_lorem,
               contains(page, '{') AS has_brace,
               len(list_filter(lines, x -> contains(lower(x), 'javascript'))) > 0 AS has_js,
               list_max(list_transform(string_split_regex(page, '\s+'), x -> length(x))) AS max_word_len,
               (NOT contains(lower(page), 'lorem ipsum'))
               AND (NOT contains(page, '{'))
               AND (len(list_filter(lines, x -> contains(lower(x), 'javascript'))) = 0)
               AND len(lines) >= 3
               AND floor(CAST(len(list_filter(lines, x -> regexp_matches(x, '[.!?"]\s*$'))) AS DOUBLE) / len(lines) * 10000.0 + 0.5) / 10000.0 >= 0.5
               AND floor(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines) * 10000.0 + 0.5) / 10000.0 <= 0.3
               AND list_max(list_transform(string_split_regex(page, '\s+'), x -> length(x))) <= 1000
               AS keep
        FROM stats
