-- ext_bpe_encode: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH words AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                             x -> x <> '') AS ws
          FROM documents),
        enc AS (
          SELECT doc_id,
                 array_to_string(list_transform(ws, w -> replace(trim(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(chr(1) || array_to_string(string_split(w, ''), chr(1)||chr(1)) || chr(1), chr(1)||'e'||chr(1)||chr(1)||'r'||chr(1), chr(1)||'er'||chr(1)), chr(1)||'i'||chr(1)||chr(1)||'n'||chr(1), chr(1)||'in'||chr(1)), chr(1)||'o'||chr(1)||chr(1)||'w'||chr(1), chr(1)||'ow'||chr(1)), chr(1)||'o'||chr(1)||chr(1)||'r'||chr(1), chr(1)||'or'||chr(1)), chr(1)||'s'||chr(1)||chr(1)||'t'||chr(1), chr(1)||'st'||chr(1)), chr(1)||'m'||chr(1)||chr(1)||'er'||chr(1), chr(1)||'mer'||chr(1)), chr(1)||'a'||chr(1)||chr(1)||'t'||chr(1), chr(1)||'at'||chr(1)), chr(1)||'l'||chr(1)||chr(1)||'u'||chr(1), chr(1)||'lu'||chr(1)), chr(1)||'a'||chr(1)||chr(1)||'r'||chr(1), chr(1)||'ar'||chr(1)), chr(1)||'p'||chr(1)||chr(1)||'ar'||chr(1), chr(1)||'par'||chr(1)), chr(1)||'j'||chr(1)||chr(1)||'o'||chr(1), chr(1)||'jo'||chr(1)), chr(1)||'jo'||chr(1)||chr(1)||'in'||chr(1), chr(1)||'join'||chr(1)), chr(1)), chr(1)||chr(1), ' ')), ' ') AS tokens
          FROM words)
        SELECT doc_id, tokens,
               CAST(CASE WHEN tokens = '' THEN 0
                    ELSE len(string_split(tokens, ' ')) END AS BIGINT) AS n_tokens
        FROM enc
