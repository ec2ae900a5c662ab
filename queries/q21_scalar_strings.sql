-- q21_scalar_strings: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT p_partkey,
              reverse(p_name) AS rev_name,
              substring(p_name, 1, 12) AS name12,
              upper(p_type) AS type_upper,
              length(p_name) AS name_len,
              CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
              FLOOR((p_retailprice * 1.1) * 100.0 + 0.5) / 100.0 AS uplift,
              concat(p_brand, ':', p_type) AS brand_type,
              replace(p_name, ' ', '_') AS snake_name
       FROM part
