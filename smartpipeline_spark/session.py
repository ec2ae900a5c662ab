"""SparkSession bootstrap with scale-oriented defaults.

All engine entry points funnel through :func:`get_spark` so every
session gets the same performance-relevant configuration: AQE (runtime
re-planning, skew-join handling, partition coalescing), Arrow for all
Python<->JVM data movement, UTC session time, and nanosecond-parquet
compatibility (the ``events`` test table is TIMESTAMP(NANOS), which
vanilla Spark refuses to read).

On a real cluster the caller passes ``master=None`` and lets
spark-submit decide; locally we default to ``local[$SPARK_GRAFT_CPUS]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Engine-wide defaults. Everything here is safe on a 1000-executor
# cluster: AQE decides final shuffle partitioning at runtime, so the
# static shuffle.partitions value only caps the *initial* plan.
_ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow everywhere Python touches rows (pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic wall-clock semantics for tests/oracles.
    "spark.sql.session.timeZone": "UTC",
    # events.parquet stores TIMESTAMP(NANOS): read as long, convert
    # explicitly in sources.events().
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Micro-batch size for mapInPandas stage execution (the engine's
    # BatchStage `size` analog caps this per-stage, see wrapper).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Python data sources (sources/pysource.py) declare pushFilters;
    # without this flag Spark refuses to plan them.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable on driver AND Python
    workers, preferring a real installation.

    Spark 4's ``transformWithStateInPandas`` state-server protocol
    imports the generated ``StateMessage_pb2``, which needs a protobuf
    runtime. Where none is installed, the vendored minimal runtime
    (``smartpipeline_spark/vendor`` — wire format implemented from the
    public spec, scoped to the state protocol's field types) is added
    to ``sys.path`` and prepended to ``$PYTHONPATH`` so forked Python
    workers inherit it. A real protobuf anywhere on the path wins:
    the vendor dir is only appended when the import fails outright.

    Returns True when google.protobuf is importable afterwards."""
    import importlib.util
    import sys

    try:
        if importlib.util.find_spec("google.protobuf") is not None:
            return True
    except (ImportError, ModuleNotFoundError, ValueError):
        pass
    vendor = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vendor")
    if vendor not in sys.path:
        sys.path.append(vendor)
    pp = os.environ.get("PYTHONPATH", "")
    if vendor not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (pp + os.pathsep + vendor) if pp else vendor
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except (ImportError, ModuleNotFoundError, ValueError):
        return False


def default_parallelism() -> int:
    """CPU budget: $SPARK_GRAFT_CPUS if set, else os.cpu_count()."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "smartpipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``shuffle_partitions`` defaults to 2x the CPU budget locally — at
    sf0.1 every shuffle partition then fits comfortably in memory, and
    AQE coalesces away the excess. On a cluster, pass an explicit
    value sized to input volume (rule of thumb: ~128MB post-shuffle
    per partition at 100 TB scale).
    """
    ensure_protobuf()  # before the JVM forks Python workers
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(_ENGINE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions if shuffle_partitions is not None else 2 * cpus
    )
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
