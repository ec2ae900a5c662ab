-- ext_stream_enrich: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
SELECT e.event_id, e.user_id, e.event_type,
              c.c_mktsegment AS mktsegment, c.c_name AS cust_name
       FROM events e JOIN customer c ON e.user_id = c.c_custkey
