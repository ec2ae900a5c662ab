"""Structured-Streaming queries registered in the oracled inventory.

The streaming surface is pytest-covered for semantics (watermarks,
late data, checkpoint restart — tests/test_streaming.py); this module
additionally exposes a DRIVER-CHECKABLE streaming row: the tumbling
event-time aggregation executed as a real streaming query (readStream
→ watermark → windowed agg → memory sink) under an ``availableNow``
trigger, compared against the SAME DuckDB oracle as its batch twin
q22. That pins the engine's core streaming claim — a streaming run
over a static directory equals the batch aggregation — with an
externally attested hash, not just a pytest.

Scale note: availableNow here is the verification harness, not the
production mode; the identical plan runs unbounded with the watermark
bounding state (1h windows x event types), and the memory sink swaps
for any DataStreamWriter sink without touching the aggregation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from smartpipeline_spark.functions import ext_query
from smartpipeline_spark.operators.relational import _sql_dsum2, dsum2

_SINK = "_ext_stream_tumbling_sink"


@ext_query(
    "ext_stream_tumbling",
    f"""SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)),
                       '%Y-%m-%d %H:%M:%S') AS window_start,
              event_type,
              COUNT(*) AS n_events,
              {_sql_dsum2('value', 'DECIMAL(28,12)')} AS sum_value
       FROM events
       GROUP BY window_start, event_type""",
)
def ext_stream_tumbling(spark, sf_dir) -> DataFrame:
    """Streaming tumbling 1h window over the events directory, run to
    completion with availableNow and returned from the memory sink —
    oracle-identical to batch q22."""
    path = os.path.join(sf_dir, "events.parquet")
    # the file-stream source requires a DIRECTORY. The production
    # layout — a directory of part files (e.g. bench.py's multipart
    # staging) — streams directly; the shipped fixtures are single
    # parquet FILES, which get a symlink-dir staged around them.
    if os.path.isdir(path):
        stage = path
    else:
        stage = os.path.join(
            "/tmp", "spark_graft_stream", sf_dir.strip("/").replace("/", "_")
        )
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, "events.parquet")
        # lexists, not exists: exists() is False for a BROKEN symlink
        # (old testdata path), which would make the symlink call raise
        # FileExistsError — recreate stale links instead
        if os.path.lexists(link):
            if os.path.realpath(link) != os.path.realpath(path):
                os.unlink(link)
                os.symlink(path, link)
        else:
            os.symlink(path, link)
    # the file-stream source needs an explicit schema: take the batch
    # reader's via sources.table (which sets nanosAsLong before the
    # probe — a fresh session on the legacy TIMESTAMP(NANOS) layout
    # would otherwise refuse the metadata read itself)
    from smartpipeline_spark import sources

    sources.table(spark, "events", sf_dir)  # conf side effect on purpose
    batch_schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(batch_schema).parquet(stage)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":  # legacy nanosAsLong layout
        stream = stream.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts div 1000 AS LONG))")
        )
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))

    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum2(F.col("value"), "decimal(28,12)").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    # complete mode so the final trigger emits every window (append
    # would withhold windows not yet past the terminal watermark)
    for q in spark.streams.active:
        if q.name == _SINK:
            q.stop()
    q = (
        agg.writeStream.format("memory")
        .queryName(_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(_SINK)
