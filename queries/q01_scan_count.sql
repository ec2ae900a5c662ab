-- q01_scan_count: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT COUNT(*) AS cnt FROM lineitem
