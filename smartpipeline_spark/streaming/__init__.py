"""Structured Streaming surface — SURVEY.md §2.10 / M3.

The reference owes only: unbounded sources, per-stage map/batch-map,
graceful stop, and backpressure (bounded queues). Spark gives all of
that natively (readStream, mapInPandas on streaming DataFrames,
query.stop(), maxFilesPerTrigger/maxOffsetsPerTrigger); this module
adds the event-time operators the reference lacks entirely —
watermarks, tumbling/sliding/session windows, late-data handling,
streaming dedup — as thin Catalyst-native helpers, plus streaming
execution for the Pipeline stage chain.

Batch-mode twins of the windowed aggregations live in
operators/relational.py (q22/q23) where they are DuckDB-oracled; the
functions here produce the SAME plans on unbounded inputs (tested by
equivalence against the batch results under an availableNow trigger).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

EVENTS_STREAM_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_events_dir(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-drop stream of event batches: new parquet files under
    ``path`` arrive as micro-batches. ``maxFilesPerTrigger`` is the
    backpressure knob (the reference's bounded-queue analog)."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "1 hour") -> DataFrame:
    """Late-data bound: rows older than max(event time) - delay are
    dropped from stateful operators and their state evicted — the
    thing that makes unbounded windowed aggregation bounded-memory."""
    return df.withWatermark(ts_col, delay)


def tumbling_counts(
    df: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time window aggregation (streaming twin of q22)."""
    return (
        df.groupBy(F.window(ts_col, window), *keys)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding windows: each event lands in window/slide overlapping
    buckets; Spark expands them JVM-side, no row duplication in user
    code."""
    return (
        df.groupBy(F.window(ts_col, window, slide), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format(F.col("window.end"), "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Session windows (dynamic-length, gap-closed). Streaming twin of
    q23; in streaming mode requires a watermark on ``ts_col``."""
    return (
        df.groupBy(F.session_window(ts_col, gap), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            *keys,
            F.unix_micros(F.col("session_window.start")).alias("sess_start_us"),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(df: DataFrame, keys: list[str], ts_col: str = "ts", delay: str = "1 hour") -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark delay are dropped; state for old keys is
    evicted. The unbounded-corpus version of ext_dedup_exact."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def stateful_user_counts(df: DataFrame, key: str = "user_id") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key
    running event counts that survive across micro-batches (the
    template for arbitrary user state machines — sessionization with
    custom logic, per-entity CDC folds, online feature accumulation).

    State is one row per key, partitioned by the grouping key across
    executors; Spark checkpoints it per batch, so at scale state size
    is bounded by distinct keys, not stream length. Emits the updated
    count for every key seen in the batch (update semantics).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key_tuple, pdf_iter, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({key: [key_tuple[0]], "n_events": [n]})

    return df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=f"{key} bigint, n_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_foreach_batch(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    available_now: bool = False,
    processing_time: str | None = None,
    output_mode: str = "append",
) -> StreamingQuery:
    """foreachBatch sink: ``fn(batch_df, batch_id)`` per micro-batch —
    the streaming sink pattern for external systems (the reference's
    Elasticsearch ``Indexer`` stage maps here)."""
    writer = (
        df.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def start_memory_sink(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    available_now: bool = True,
) -> StreamingQuery:
    """Memory sink for tests/interactive use: results land in the
    in-memory table ``name`` (driver-sized outputs only)."""
    writer = (
        df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: pairs a left row with
    every right row of the same ``key`` whose event time falls in
    ``[left.ts - within, left.ts]``. Both sides carry watermarks and
    the join condition bounds event time in BOTH directions, so Spark
    can evict join state past the horizon — the requirement that makes
    a stream-stream join run with bounded memory on unbounded input.
    Works identically on batch DataFrames (state logic just vanishes).
    """
    l = left.withWatermark(ts_col, watermark).alias("l") if left.isStreaming else left.alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r") if right.isStreaming else right.alias("r")
    return l.join(
        r,
        F.expr(
            f"l.{key} = r.{key} AND "
            f"r.{ts_col} BETWEEN l.{ts_col} - INTERVAL {within} AND l.{ts_col}"
        ),
    )


def continuous_rollup(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    window: str = "1 hour",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str = "2 hours",
    available_now: bool = False,
) -> StreamingQuery:
    """Continuously-maintained time-bucketed aggregate table (the
    hypertable / continuous-aggregate pattern): a watermarked windowed
    aggregation runs in UPDATE mode and each micro-batch upserts ONLY
    the (bucket, key) groups it changed — the sink is parquet
    partitioned by (bucket, *keys), so one group = one partition and
    dynamic partition overwrite IS the upsert. Readers always see the
    latest finalized-or-running totals with spark.read.parquet(path).

    At 100 TB: buckets are coarse (hours/days) so partitions stay
    chunky; the many-small-files pressure from hot keys is handled by
    a periodic compaction pass, and watermarking bounds both state and
    how far back a partition can still be rewritten."""
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd-HH").alias("bucket"),
            *keys,
            "n_events",
            "sum_value",
        )
    )

    def upsert(batch_df: DataFrame, _batch_id: int) -> None:
        # availableNow drains end with a finalization micro-batch that
        # carries no updated groups (the watermark-advance batch); a
        # dynamic-overwrite of an empty frame still pays a full write
        # job + commit-protocol pass over the partition tree. With
        # dynamic overwrite an empty write is a NO-OP by definition
        # (no partitions to replace), so skip it outright. foreachBatch
        # frames re-execute their plan per action, so persist around
        # the probe + write — otherwise every NON-empty batch pays the
        # rollup twice to save one no-op write at the end.
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            (
                batch_df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket", *keys)
                .parquet(path)
            )
        finally:
            batch_df.unpersist()

    writer = (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_user_counts_tws(df: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key running counts on the Spark-4 ``transformWithStateInPandas``
    API — the successor to ``applyInPandasWithState`` above, kept side
    by side because the two APIs differ operationally at scale:
    transformWithState runs on the RocksDB state store (state spills
    to local disk instead of capping at executor heap), supports
    multiple named state variables, TTL, and timers per key. For a
    100 TB ingest with hundreds of millions of live keys, this is the
    one to use; the applyInPandasWithState twin remains the
    compatibility path. Runtime dependency: the TWS wire protocol
    needs a protobuf runtime on driver and executors —
    ``session.ensure_protobuf()`` provides the vendored minimal
    wire-format runtime (vendor/google/protobuf) where the real
    package is not installed."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n bigint")

        def handleInputRows(self, key_tuple, rows, timer_values):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({key: [key_tuple[0]], "n_events": [n]})

        def close(self) -> None:
            pass

    return df.groupBy(key).transformWithStateInPandas(
        statefulProcessor=RunningCount(),
        outputStructType=f"{key} bigint, n_events bigint",
        outputMode="Update",
        timeMode="None",
    )


def enrich_with_static(
    stream: DataFrame, dim: DataFrame, key: str, broadcast: bool = True
) -> DataFrame:
    """Stream-static join: enrich a stream with a batch dimension
    table. The static side is re-read per micro-batch (Spark's
    stream-static contract — slowly-changing dims pick up updates for
    free) and broadcast by default, so each micro-batch pays a
    map-side hash join with NO state store and no watermark — the
    right shape for reference-data enrichment, versus the stateful
    stream-stream ``interval_join`` above which buffers both sides."""
    from pyspark.sql.functions import broadcast as bcast

    return stream.join(bcast(dim) if broadcast else dim, key)
