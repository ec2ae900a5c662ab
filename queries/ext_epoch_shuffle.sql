-- ext_epoch_shuffle: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH e AS (SELECT doc_id, epoch FROM documents, (VALUES (1), (2)) t(epoch)),
      k AS (SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
                   md5('epoch' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS key
            FROM e)
     SELECT epoch, doc_id,
            CAST(row_number() OVER (PARTITION BY epoch ORDER BY key, doc_id) AS BIGINT) AS pos
     FROM k
