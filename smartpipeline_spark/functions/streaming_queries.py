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

import math
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, functions as F

from smartpipeline_spark.functions import ext_query
from smartpipeline_spark.operators.relational import _sql_dsum2, dsum2

_SINK = "_ext_stream_tumbling_sink"
_SESSION_SINK = "_ext_stream_session_sink"
_SLIDING_SINK = "_ext_stream_sliding_sink"
_JOIN_SINK = "_ext_stream_join_sink"
_DEDUP_SINK = "_ext_stream_dedup_sink"


def _staged_event_stream(spark, sf_dir):
    """readStream over the events fixture: stages a symlink directory
    around the single-file layout (file-stream sources need a
    directory), takes the batch reader's schema (nanos conf set
    first), and normalizes legacy ts encodings — shared by every
    registered streaming query."""
    path = os.path.join(sf_dir, "events.parquet")
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
    return stream


# --- scale-derived state-partition width for availableNow drains ----
#
# Every STATEFUL streaming operator commits one state-store per state
# partition per trigger (a stream-stream join commits FOUR per
# partition), and the partition count binds to
# spark.sql.shuffle.partitions at the query's first checkpoint. That
# commit is a fixed I/O cost independent of the rows in the partition,
# so at small state cardinality the drain's wall is LINEAR in the
# width while the width buys nothing. Measured (r13 solo probe,
# sf0.1, min-of-3 per cell, widths 64/32/16/8):
#   ext_stream_tumbling   2.02 / 1.59 / 1.14 / 0.92 s
#   ext_stream_sliding    1.94 / 1.52 / 1.13 / 0.93 s
#   ext_stream_session    2.17 / 1.60 / 1.35 / 1.16 s
#   ext_stream_join      10.66 / 6.27 / 3.61 / 2.44 s
#   ext_stream_outer_join 10.41 / 6.00 / 3.71 / 2.53 s
#   ext_stream_dedup      1.90 / 1.07 / 0.84 / 0.72 s
# The session default (2 x cores) is therefore a per-core PENALTY for
# small drains — the same key measured 7x slower at 32 cores than at
# 8 purely from the wider state layout. Rule (parameterized, not a
# local[32] constant): one state partition per ~2 MiB of drained
# input, floor 8 (the ext_stream_upsert/TWS measured pick), and leave
# the session conf in charge once the derived width reaches it — at
# the 64x replicated rung (~128 MiB) the rule already yields the
# session width, matching the r11 telemetry that 2 x cores is right
# at millions of state keys (128 partitions measured +11% CPU there).
_STATE_PARTITION_BYTES = 2 * 1024 * 1024
_STATE_PARTITION_FLOOR = 8


def _input_bytes(*paths: str) -> int | None:
    """Total on-disk bytes of the staged stream input(s) — files or
    directories (symlink-staged fixture layouts follow the link
    target). None when any path cannot be sized."""
    total = 0
    try:
        for p in paths:
            if os.path.isdir(p):
                for root, _dirs, files in os.walk(p):
                    for f in files:
                        total += os.path.getsize(os.path.join(root, f))
            else:
                total += os.path.getsize(p)
    except OSError:
        return None
    return total


def _state_width(spark, *paths: str) -> int | None:
    """The width the rule above derives for a drain over ``paths``,
    or None when the session conf should stay in charge (input
    unsizable, or derived width at/over the session width)."""
    size = _input_bytes(*paths)
    if size is None:
        return None
    try:
        sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return None
    p = 2 ** max(
        round(math.log2(_STATE_PARTITION_FLOOR)),
        round(math.log2(max(1.0, size / _STATE_PARTITION_BYTES))),
    )
    return p if p < sess else None


@contextmanager
def _scoped_state_width(spark, *paths: str):
    """Scope ``spark.sql.shuffle.partitions`` to the derived state
    width for the duration of a drain (streaming confs bind at query
    START, so only the stream started inside the scope is affected)
    and restore the session value after."""
    width = _state_width(spark, *paths)
    if width is None:
        yield
        return
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(width))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _run_to_memory(
    spark, agg, sink_name: str, input_paths: tuple[str, ...] = ()
) -> DataFrame:
    """Execute a streaming aggregation to completion (availableNow,
    complete mode so the final trigger emits every window) into a
    memory sink and return its table. ``input_paths`` (the staged
    stream input) drives the scale-derived state-partition width —
    empty leaves the session conf in charge."""
    for q in spark.streams.active:
        if q.name == sink_name:
            q.stop()
    with _scoped_state_width(spark, *input_paths):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    return spark.table(sink_name)


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
    oracle-identical to batch q22.  (The file-stream source requires a
    DIRECTORY; production layouts — directories of part files — stream
    directly, and :func:`_staged_event_stream` symlink-stages the
    shipped single-file fixtures.)"""
    stream = _staged_event_stream(spark, sf_dir)
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
    return _run_to_memory(
        spark, agg, _SINK, (os.path.join(sf_dir, "events.parquet"),)
    )


@ext_query(
    "ext_stream_sliding",
    """SELECT strftime(time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
                      - k * INTERVAL 15 MINUTE, '%Y-%m-%d %H:%M:%S') AS window_start,
              event_type, COUNT(*) AS n_events
       FROM events, LATERAL (SELECT unnest(generate_series(0, 3)) AS k) t
       GROUP BY window_start, event_type""",
)
def ext_stream_sliding(spark, sf_dir) -> DataFrame:
    """Sliding 1h/15min windows executed as a REAL streaming query —
    the overlapping-assignment window class (each event owned by
    exactly 4 windows), completing the streaming triad beside
    ext_stream_tumbling (non-overlapping) and ext_stream_session
    (stateful-merging).  Run to completion under availableNow against
    the same generate_series enumeration oracle as batch q22b.  Same
    harness contract: availableNow + complete-mode memory sink is the
    verification harness; unbounded, the 1h watermark expires a
    window's state once the frontier passes its END (the engine keeps
    ~4x tumbling state — the overlap factor — which is why production
    slides should divide the width coarsely, not per-minute)."""
    stream = _staged_event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )
    return _run_to_memory(
        spark, agg, _SLIDING_SINK, (os.path.join(sf_dir, "events.parquet"),)
    )


@ext_query(
    "ext_stream_join",
    """SELECT l.event_id AS click_id, r.event_id AS view_id
       FROM events l JOIN events r
         ON l.user_id = r.user_id
        AND l.event_type = 'click' AND r.event_type = 'view'
        AND CAST(r.ts AS TIMESTAMP)
            BETWEEN CAST(l.ts AS TIMESTAMP) - INTERVAL 10 MINUTE
                AND CAST(l.ts AS TIMESTAMP)""",
)
def ext_stream_join(spark, sf_dir) -> DataFrame:
    """Watermarked STREAM-STREAM interval join as a real streaming
    query — the fourth attested streaming class beside the three
    window shapes: clicks pair with same-user views from the
    preceding 10 minutes, both sides watermarked so join state
    evicts past the horizon (the property that lets this run with
    bounded memory on unbounded input; inner-join matches emit as
    soon as both rows arrive, the watermark only gates eviction).
    Drained with availableNow in append mode (the only output mode
    stream-stream joins support) against the plain batch interval
    join as the DuckDB oracle."""
    from smartpipeline_spark.streaming import interval_join

    stream = _staged_event_stream(spark, sf_dir)
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    views = stream.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    joined = interval_join(
        clicks, views, key="user_id", ts_col="ts", within="10 minutes"
    ).select("l.click_id", "r.view_id")
    for q in spark.streams.active:
        if q.name == _JOIN_SINK:
            q.stop()
    # a stream-stream join commits FOUR state stores per partition per
    # trigger — the widest fixed cost in the streaming family (see the
    # width table above _state_width)
    with _scoped_state_width(spark, os.path.join(sf_dir, "events.parquet")):
        q = (
            joined.writeStream.format("memory")
            .queryName(_JOIN_SINK)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    return spark.table(_JOIN_SINK)


@ext_query(
    "ext_stream_dedup",
    """SELECT DISTINCT user_id, event_type FROM events""",
)
def ext_stream_dedup(spark, sf_dir) -> DataFrame:
    """Stateful streaming DEDUP as a real streaming query — the
    stateful-distinct class beside windows and the stream-stream
    join: ``dropDuplicates`` keeps the first (user_id, event_type)
    arrival and suppresses every later one, draining to exactly the
    batch DISTINCT. This variant keeps keys forever (state = key
    cardinality — here a few hundred pairs; the right choice when the
    key space is bounded, e.g. entity ids); for unbounded key spaces
    production uses ``dropDuplicatesWithinWatermark`` (state evicted
    past the horizon, pytest-covered in tests/test_streaming.py)
    whose time-bounded semantics intentionally differ from batch
    DISTINCT, which is why THIS key, not that one, carries the
    oracle."""
    stream = _staged_event_stream(spark, sf_dir)
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    for q in spark.streams.active:
        if q.name == _DEDUP_SINK:
            q.stop()
    with _scoped_state_width(spark, os.path.join(sf_dir, "events.parquet")):
        q = (
            deduped.writeStream.format("memory")
            .queryName(_DEDUP_SINK)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    return spark.table(_DEDUP_SINK)


@ext_query(
    "ext_stream_session",
    """WITH e AS (
         SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us, value
         FROM events),
       marked AS (
         SELECT user_id, t_us, value,
                CASE WHEN t_us - LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us)
                          >= 1800000000
                       OR LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us) IS NULL
                     THEN 1 ELSE 0 END AS new_sess
         FROM e),
       sess AS (
         SELECT user_id, t_us, value,
                SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM marked)
       SELECT user_id, MIN(t_us) AS sess_start_us, COUNT(*) AS n_events,
              FLOOR((CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE)) * 100.0 + 0.5)
                / 100.0 AS sum_value
       FROM sess GROUP BY user_id, sid""",
)
def ext_stream_session(spark, sf_dir) -> DataFrame:
    """Session windows (30-min gap, per user) executed as a REAL
    streaming query — the stateful-merging window shape, where the
    engine must MERGE adjacent session state as events arrive rather
    than route rows to precomputed buckets.  Run to completion under
    availableNow against the same gaps-and-islands DuckDB oracle as
    batch q23, pinning streaming/batch equivalence for the second
    (harder) window class.  Same harness contract as
    ext_stream_tumbling: availableNow + memory sink is the
    verification harness; the identical plan runs unbounded with the
    watermark closing sessions 1h behind the event-time frontier."""
    stream = _staged_event_stream(spark, sf_dir)
    agg = (
        stream.withColumn("t_us", F.unix_micros(F.col("ts")))
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.min("t_us").alias("sess_start_us"),
            F.count("*").alias("n_events"),
            dsum2(F.col("value"), "decimal(28,12)").alias("sum_value"),
        )
        .select("user_id", "sess_start_us", "n_events", "sum_value")
    )
    return _run_to_memory(
        spark, agg, _SESSION_SINK, (os.path.join(sf_dir, "events.parquet"),)
    )


@ext_query(
    "ext_stream_upsert",
    """SELECT strftime(time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)),
                       '%Y-%m-%d-%H') AS bucket,
              event_type,
              COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       FROM events GROUP BY bucket, event_type""",
)
def ext_stream_upsert(spark, sf_dir) -> DataFrame:
    """The streaming SINK class, completing the driver-attested
    streaming story (windows, join, dedup — and now the upsert sink):
    :func:`smartpipeline_spark.streaming.continuous_rollup` runs the
    watermarked tumbling aggregation in UPDATE mode and each
    micro-batch upserts only the (bucket, event_type) groups it
    changed via foreachBatch + dynamic partition overwrite — the
    hypertable / continuous-aggregate pattern. The registered query
    drains the fixture stream under availableNow into a per-run temp
    table and returns what a READER of the maintained table sees
    (spark.read.parquet), so the oracle checks the on-disk upsert
    result, not the in-flight aggregation. Decimal(18,4) summation is
    exact, so the double-cast totals are drift-free in both engines.

    Registered at DAILY buckets: partition-per-group is the sink's
    whole design, so bucket granularity IS the file-count knob —
    hourly buckets over the fixture's month span mean ~3400 tiny
    partition dirs (and 30s of filesystem churn per sweep run), while
    daily buckets keep ~150. The same knob governs production.

    At 100 TB: coarse buckets keep partitions chunky, the
    upsert rewrites only changed partitions per trigger, and the
    watermark bounds both state and how far back a partition can
    still be rewritten (streaming/__init__.py:216)."""
    import shutil

    from smartpipeline_spark import streaming

    stream = _staged_event_stream(spark, sf_dir)
    # fixed per-(sf, pid) staging, CLEARED each invocation (the
    # export-shards lesson: per-run mkdtemp leaks a directory per
    # sweep/bench call, while a reused dir must not keep a stale
    # checkpoint — a checkpoint that believes the files are already
    # processed would drain zero batches and attest an empty table).
    # The pid suffix keeps concurrent sessions at the same sf (sweep +
    # driver_sim) from rmtree-ing each other's in-flight stream state.
    root = os.path.join("/tmp", "spark_graft_stream_upsert")
    base = os.path.join(
        root, f"{sf_dir.strip('/').replace('/', '_')}_{os.getpid()}"
    )
    # sweep DEAD siblings (dirs whose pid no longer runs) so distinct
    # processes don't each leave a stale rollup+checkpoint behind
    # forever — only live pids are protected, which is exactly the
    # concurrency contract the pid suffix exists for
    if os.path.isdir(root):
        for d in os.listdir(root):
            pid_part = d.rsplit("_", 1)[-1]
            if not pid_part.isdigit() or int(pid_part) == os.getpid():
                continue
            try:
                os.kill(int(pid_part), 0)  # raises if pid is gone
            except ProcessLookupError:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
            except PermissionError:
                pass  # pid alive under another user: leave it
    shutil.rmtree(base, ignore_errors=True)
    out = os.path.join(base, "rollup")
    ckpt = os.path.join(base, "ckpt")
    # the fixture replay can arrive in any file order, so the late
    # horizon must span the corpus (same reasoning as the pytest twin)
    #
    # State-partition count binds FOREVER at the stream's first
    # checkpoint and every trigger pays per-partition state-store
    # file I/O + a write task; at the fixture's ~150-group
    # cardinality, 8 partitions cut the drain's floor from 5.8s to
    # 3.9s (min-of-5, idle) with identical output. r13: the width now
    # comes from the shared input-size rule (_state_width — 8 at
    # fixture scale, the session conf once the input earns it) instead
    # of this drain's private constant.
    with _scoped_state_width(spark, os.path.join(sf_dir, "events.parquet")):
        q = streaming.continuous_rollup(
            stream,
            out,
            ckpt,
            window="1 day",
            watermark="365 days",
            available_now=True,
        )
        q.awaitTermination()
    return spark.read.parquet(out).select(
        "bucket", "event_type", "n_events", "sum_value"
    )


_OUTER_JOIN_SINK = "_ext_stream_outer_join_sink"


def _staged_outer_stream_dir(sf_dir: str) -> str:
    """Stage directory for the LEFT-OUTER stream-stream join: the
    events fixture (symlink) plus a one-row SENTINEL parquet whose
    event time sits 1 day past the corpus maximum. Outer joins emit
    their NULL-padded rows only when the watermark passes a row's
    eviction horizon, and a drained availableNow run stops with the
    watermark ``delay`` behind the last REAL event — holding back
    every unmatched row near the stream tail. The sentinel (filtered
    out of both join legs by its event_type) advances the final
    watermark past every real row's horizon, so the drain emits
    exactly the batch LEFT JOIN — which is what lets this key carry
    a DuckDB oracle at all. Content is deterministic per fixture, so
    the stage is written once and reused (no per-pid litter — the
    round-5 stale-dir advisory)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "events.parquet")
    stage = os.path.join(
        "/tmp",
        "spark_graft_stream_outer",
        sf_dir.strip("/").replace("/", "_"),
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if os.path.lexists(link):
        if os.path.realpath(link) != os.path.realpath(path):
            os.unlink(link)
            os.symlink(path, link)
    else:
        os.symlink(path, link)
    sentinel = os.path.join(stage, "sentinel.parquet")
    if not os.path.exists(sentinel):
        t = pq.read_table(path)
        one_day = {
            "s": 86_400,
            "ms": 86_400_000,
            "us": 86_400_000_000,
            "ns": 86_400_000_000_000,
        }
        arrays = []
        for field in t.schema:
            if field.name == "ts":
                mx = pc.max(t.column("ts"))
                if pa.types.is_timestamp(field.type):
                    val = mx.cast(pa.int64()).as_py() + one_day[field.type.unit]
                    arr = pa.array([val], pa.int64()).cast(field.type)
                else:  # legacy nanosAsLong bigint layout
                    arr = pa.array([mx.as_py() + one_day["ns"]], field.type)
            elif field.name == "event_type":
                arr = pa.array(["sentinel"], field.type)
            elif field.name in ("event_id", "user_id"):
                arr = pa.array([-1], field.type)
            else:
                arr = pa.nulls(1, field.type)
            arrays.append(arr)
        pq.write_table(
            pa.table(arrays, schema=pa.schema(list(t.schema))), sentinel
        )
    return stage


@ext_query(
    "ext_stream_outer_join",
    """SELECT l.event_id AS click_id, r.event_id AS view_id
       FROM events l LEFT JOIN events r
         ON l.user_id = r.user_id
        AND r.event_type = 'view'
        AND CAST(r.ts AS TIMESTAMP)
            BETWEEN CAST(l.ts AS TIMESTAMP) - INTERVAL 10 MINUTE
                AND CAST(l.ts AS TIMESTAMP)
       WHERE l.event_type = 'click'""",
)
def ext_stream_outer_join(spark, sf_dir) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join — the
    state-EXPIRY streaming class beside the inner join
    (ext_stream_join): an unmatched click emits its NULL-padded row
    only when the watermark proves no matching view can still
    arrive, so correctness depends on the eviction machinery, not
    just match routing. Both sides watermarked; drained with
    availableNow in append mode over a staged directory that adds a
    watermark-advancing sentinel event (see
    :func:`_staged_outer_stream_dir`), making the drained output
    exactly the batch LEFT JOIN the DuckDB oracle runs."""
    from smartpipeline_spark import sources

    stage = _staged_outer_stream_dir(sf_dir)
    sources.table(spark, "events", sf_dir)  # nanos conf side effect
    batch_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema
    stream = spark.readStream.schema(batch_schema).parquet(stage)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts div 1000 AS LONG))")
        )
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    # the sentinel rides INSIDE both legs (not filtered out before
    # them): the watermark advances from rows that flow through each
    # leg's EventTimeWatermark operator, so a pre-leg filter would
    # silently exclude the sentinel from the very statistic it exists
    # to advance — which holds back the LAST unmatched click (the one
    # whose ts IS the leg maximum). The sentinel's own rows carry
    # user_id = -1 and are dropped after the join.
    clicks = (
        stream.filter(F.col("event_type").isin("click", "sentinel"))
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
        .withWatermark("ts", "1 hour")
        .alias("l")
    )
    views = (
        stream.filter(F.col("event_type").isin("view", "sentinel"))
        .select("user_id", "ts", F.col("event_id").alias("view_id"))
        .withWatermark("ts", "1 hour")
        .alias("r")
    )
    # NOTE the sentinel filter is NOT part of the streaming plan: a
    # deterministic predicate that doesn't reference the event-time
    # column pushes THROUGH EventTimeWatermark
    # (PushPredicateThroughNonJoin), which would silently re-exclude
    # the sentinel from the watermark statistic — measured exactly so
    # (final watermark regressed to max-real-click − 1h and the last
    # unmatched click stayed in state). The sentinel pair instead
    # inner-matches itself (user −1, equal ts), emits in batch 0, and
    # is dropped from the SINK table below, where pushdown is
    # harmless.
    joined = clicks.join(
        views,
        F.expr(
            "l.user_id = r.user_id AND "
            "r.ts BETWEEN l.ts - INTERVAL 10 MINUTES AND l.ts"
        ),
        "leftOuter",
    ).select("l.click_id", "r.view_id")
    for q in spark.streams.active:
        if q.name == _OUTER_JOIN_SINK:
            q.stop()
    with _scoped_state_width(spark, stage):
        q = (
            joined.writeStream.format("memory")
            .queryName(_OUTER_JOIN_SINK)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    return spark.table(_OUTER_JOIN_SINK).filter(F.col("click_id") >= 0)


# ------------------------------- stream-static enrichment join (class 8)

_ENRICH_SINK = "_ext_stream_enrich_sink"


@ext_query(
    "ext_stream_enrich",
    """SELECT e.event_id, e.user_id, e.event_type,
              c.c_mktsegment AS mktsegment, c.c_name AS cust_name
       FROM events e JOIN customer c ON e.user_id = c.c_custkey""",
)
def ext_stream_enrich(spark, sf_dir) -> DataFrame:
    """STREAM-STATIC enrichment join — the eighth attested streaming
    class and the bread-and-butter production pattern (enrich an
    event stream with a dimension table). The static side is re-read
    per micro-batch and BROADCAST (it is a dim, not a stream), the
    join is STATELESS — no watermark, no state store, append mode —
    so unlike the stream-stream classes there is nothing to evict:
    every enriched row is emitted exactly once. Attested at ROW level
    (the joined rows themselves, not an aggregate) against the batch
    join oracle.

    100 TB design: at scale the dim broadcast is per-executor, the
    stream never shuffles (map-side hash join inside each
    micro-batch), and dim updates are picked up batch-by-batch — the
    documented Spark pattern for slowly-changing enrichment."""
    from smartpipeline_spark import sources

    stream = _staged_event_stream(spark, sf_dir)
    dim = sources.table(spark, "customer", sf_dir).select(
        F.col("c_custkey"), F.col("c_mktsegment"), F.col("c_name")
    )
    joined = stream.join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"]
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_name").alias("cust_name"),
    )
    for q in spark.streams.active:
        if q.name == _ENRICH_SINK:
            q.stop()
    q = (
        joined.writeStream.format("memory")
        .queryName(_ENRICH_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(_ENRICH_SINK)


# ----------------------- custom stateful operator (class 9, arbitrary state)

_STATEFUL_SINK = "_ext_stream_stateful_sink"


@ext_query(
    "ext_stream_stateful",
    """SELECT user_id, COUNT(*) AS n_events
       FROM events GROUP BY user_id""",
)
def ext_stream_stateful(spark, sf_dir) -> DataFrame:
    """CUSTOM stateful operator — the ninth streaming class:
    ``applyInPandasWithState`` per-key running counts (the template
    for arbitrary user state machines: custom sessionization,
    per-entity CDC folds, online feature accumulation — state Spark's
    built-in stateful operators cannot express). Update mode emits
    the refreshed count for every key seen in each micro-batch; the
    count per key is MONOTONE, so ``max`` over the update stream is
    the final total regardless of how the source splits into
    micro-batches — which makes the class EXACTLY oracle-able against
    the batch ``GROUP BY`` (most custom-state demos settle for
    rows-only).

    100 TB design: state is one row per key partitioned by the
    grouping key, checkpointed per batch — bounded by distinct keys,
    not stream length; the pandas kernel sees each key's batch slice
    via Arrow."""
    from smartpipeline_spark.streaming import stateful_user_counts

    stream = _staged_event_stream(spark, sf_dir)
    counts = stateful_user_counts(stream, key="user_id")
    for q in spark.streams.active:
        if q.name == _STATEFUL_SINK:
            q.stop()
    with _scoped_state_width(spark, os.path.join(sf_dir, "events.parquet")):
        q = (
            counts.writeStream.format("memory")
            .queryName(_STATEFUL_SINK)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    return (
        spark.table(_STATEFUL_SINK)
        .groupBy("user_id")
        .agg(F.max("n_events").cast("long").alias("n_events"))
    )


_STATEFUL_TWS_SINK = "_ext_stream_stateful_tws_sink"


@ext_query(
    "ext_stream_stateful_tws",
    """SELECT user_id, COUNT(*) AS n_events
       FROM events GROUP BY user_id""",
)
def ext_stream_stateful_tws(spark, sf_dir) -> DataFrame:
    """``transformWithStateInPandas`` per-key running counts — the
    TENTH streaming class, and the Spark-4 successor to the
    applyInPandasWithState class above: state lives in the RocksDB
    state store (spills to local disk instead of capping at executor
    heap; named state variables, TTL, timers). Same monotone-count
    trick as ext_stream_stateful, so the update stream's per-key max
    is EXACTLY the batch GROUP BY — a full value-hash oracle for a
    custom-state streaming operator.

    The JVM<->Python state protocol needs a protobuf runtime;
    session.ensure_protobuf() provides the vendored minimal runtime
    where none is installed (vendor/google/protobuf — wire format
    from the public spec). TWS requires the RocksDB provider, which
    is set for the duration of the drain and restored after (stream
    confs bind at query start, so concurrent keys are unaffected)."""
    from smartpipeline_spark.streaming import stateful_user_counts_tws

    stream = _staged_event_stream(spark, sf_dir)
    counts = stateful_user_counts_tws(stream, key="user_id")
    for q in spark.streams.active:
        if q.name == _STATEFUL_TWS_SINK:
            q.stop()
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    # each state partition spins its own RocksDB instance per trigger;
    # at fixture key-cardinality (150) 8 partitions cut the drain from
    # ~57s to the instance-setup floor without changing semantics. At
    # production cardinality the state partition count is the real
    # parallelism knob and binds FOREVER at first checkpoint — r13:
    # width from the shared input-size rule (_state_width), not a
    # fixture constant.
    try:
        with _scoped_state_width(
            spark, os.path.join(sf_dir, "events.parquet")
        ):
            q = (
                counts.writeStream.format("memory")
                .queryName(_STATEFUL_TWS_SINK)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)
    return (
        spark.table(_STATEFUL_TWS_SINK)
        .groupBy("user_id")
        .agg(F.max("n_events").cast("long").alias("n_events"))
    )
