-- ext_entropy_filter: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH c AS (
          SELECT doc_id, length(text) AS n,
                 list_distinct(string_split(text, '')) AS dc,
                 string_split(text, '') AS cs
          FROM documents),
        ce AS (
          SELECT doc_id, n,
                 log2(n) - list_sum(list_transform(dc, ch ->
                   len(list_filter(cs, x -> x = ch))
                   * log2(len(list_filter(cs, x -> x = ch))))) / n AS hc
          FROM c),
        w AS (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS wd
              FROM documents),
        wcnt AS (SELECT doc_id, wd, COUNT(*) AS cnt
                 FROM w WHERE wd <> '' GROUP BY doc_id, wd),
        we AS (SELECT doc_id, SUM(cnt) AS nw,
                      log2(SUM(cnt)) - SUM(cnt * log2(cnt)) / SUM(cnt) AS hw
               FROM wcnt GROUP BY doc_id)
        SELECT ce.doc_id,
               CAST(ce.n AS BIGINT) AS n_chars,
               CAST(COALESCE(we.nw, 0) AS BIGINT) AS n_words,
               floor(ce.hc * 10000.0 + 0.5) / 10000.0 AS char_entropy,
               floor(we.hw * 10000.0 + 0.5) / 10000.0 AS word_entropy,
               ce.hc >= 4.0 AND COALESCE(we.hw >= 4.0, FALSE) AS keep
        FROM ce LEFT JOIN we USING (doc_id)
