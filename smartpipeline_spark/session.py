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
    # Always use the sort-based shuffle writer, never the bypass-merge
    # writer. Bypass (the default for <= 200 reduce partitions) opens
    # one file + compression stream per (map task x reduce partition);
    # that per-BLOCK fixed cost measured ~4 ms CPU here, so a plain
    # 32-map x 64-reduce exchange burned ~10 executor-CPU-s in file
    # opens alone (r13 probe: repartition(64) of 190k rows 11.5 -> 0.4
    # CPU-s, ext_contamination_bloom 18.7 -> 3.9 CPU-s with the sort
    # writer). Above 200 partitions — i.e. at scale — Spark already
    # takes the sort path, so this aligns small-shuffle behavior with
    # the at-scale write path instead of paying M x R block creation
    # (guide §2.2's quadratic) on every fixture-scale exchange.
    "spark.shuffle.sort.bypassMergeThreshold": "2",
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


# Marker file identifying a site-packages google/protobuf as OUR
# provisioned shim copy (never a real installation): safe to refresh
# or remove. A real protobuf ships no such file.
SHIM_MARKER = "_VENDORED_BY_SMARTPIPELINE_SPARK"


def _protobuf_importable() -> bool:
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except (ImportError, ModuleNotFoundError, ValueError):
        return False


# Opt-out: set SMARTPIPELINE_SPARK_NO_PROVISION=1 to forbid the
# site-packages write entirely. ensure_protobuf() then falls back to
# the PYTHONPATH mechanism, which still covers every JVM the engine
# launches itself (only workers forked by a pre-existing external JVM
# lose the shim — the tradeoff the env owner opted into).
NO_PROVISION_ENV = "SMARTPIPELINE_SPARK_NO_PROVISION"


def _site_candidates() -> list[str]:
    """The writable-site-packages search order provision/unprovision
    share: purelib first, then global site dirs, then the user dir."""
    import site
    import sysconfig

    candidates: list[str] = []
    try:
        candidates.append(sysconfig.get_paths()["purelib"])
    except (KeyError, OSError):
        pass
    try:
        candidates.extend(site.getsitepackages())
    except (AttributeError, OSError):
        pass
    try:
        candidates.append(site.getusersitepackages())
    except (AttributeError, OSError):
        pass
    return list(dict.fromkeys(candidates))


def provision_protobuf() -> str | None:
    """Install the vendored ``google.protobuf`` shim into a writable
    site-packages as a PEP-420 namespace portion (``google/`` with NO
    ``__init__.py``), so that Python workers forked by a JVM *this
    engine did not launch* can still import it.

    The PYTHONPATH mechanism in :func:`ensure_protobuf` only reaches
    workers when it runs before the JVM starts; an external driver
    that owns its SparkSession (the round-8 `ext_stream_stateful_tws`
    crash) forks the transformWithStateInPandas state-server worker
    from an environment we never touched. site-packages is on every
    fresh interpreter's path, so a copy there is launch-order-proof.

    Safety: provisions only when ``google.protobuf`` is unimportable;
    never touches an existing ``google/protobuf`` that lacks our
    marker file; installs atomically (temp dir + rename) so
    concurrent imports cannot observe a half-copied package; a later
    real installation overwrites the same path and wins.

    Returns the directory provisioned into, or None (already
    importable, opted out via $SMARTPIPELINE_SPARK_NO_PROVISION, or
    nowhere writable)."""
    import importlib
    import shutil
    import tempfile

    if os.environ.get(NO_PROVISION_ENV, "").strip() not in ("", "0"):
        return None
    if _protobuf_importable():
        return None
    vendor_pb = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "vendor", "google", "protobuf"
    )
    for sp in _site_candidates():
        try:
            os.makedirs(sp, exist_ok=True)
        except OSError:
            continue
        if not os.access(sp, os.W_OK):
            continue
        target_google = os.path.join(sp, "google")
        target_pb = os.path.join(target_google, "protobuf")
        if os.path.exists(os.path.join(target_google, "__init__.py")):
            # a regular (non-namespace) google package owns the name
            # here; adding a portion beside it would be invisible.
            continue
        refresh = os.path.isdir(target_pb) and os.path.exists(
            os.path.join(target_pb, SHIM_MARKER)
        )
        if os.path.exists(target_pb) and not refresh:
            continue  # unmarked => not ours; leave it alone
        try:
            os.makedirs(target_google, exist_ok=True)
            tmp = tempfile.mkdtemp(prefix=".protobuf_shim_", dir=target_google)
            staged = os.path.join(tmp, "protobuf")
            shutil.copytree(vendor_pb, staged)
            with open(os.path.join(staged, SHIM_MARKER), "w") as f:
                f.write(
                    "Vendored minimal protobuf shim provisioned by "
                    "smartpipeline_spark.session.provision_protobuf().\n"
                    "Safe to delete; `pip install protobuf` replaces it.\n"
                )
            if refresh:
                shutil.rmtree(target_pb, ignore_errors=True)
            try:
                os.rename(staged, target_pb)
            except OSError:
                # concurrent provisioner won the rename — that's fine
                pass
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
            importlib.invalidate_caches()
            if _protobuf_importable():
                return sp
        except OSError:
            continue
    return None


def unprovision_protobuf() -> list[str]:
    """Remove every site-packages protobuf copy that
    :func:`provision_protobuf` owns — identified STRICTLY by the
    :data:`SHIM_MARKER` file, so a real ``pip install protobuf`` (which
    ships no marker) is never touched. The enclosing namespace
    ``google/`` dir is removed too when the shim was its only content
    (we never created it otherwise); a ``google/`` holding anything
    else is left alone. Returns the removed ``google/protobuf`` paths
    (empty when nothing of ours was found)."""
    import importlib
    import shutil

    removed: list[str] = []
    for sp in _site_candidates():
        target_google = os.path.join(sp, "google")
        target_pb = os.path.join(target_google, "protobuf")
        if not os.path.exists(os.path.join(target_pb, SHIM_MARKER)):
            continue
        shutil.rmtree(target_pb, ignore_errors=True)
        if not os.path.exists(target_pb):
            removed.append(target_pb)
        try:
            if not os.listdir(target_google):
                os.rmdir(target_google)
        except OSError:
            pass
    if removed:
        importlib.invalidate_caches()
    return removed


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable on driver AND Python
    workers, preferring a real installation.

    Spark 4's ``transformWithStateInPandas`` state-server protocol
    imports the generated ``StateMessage_pb2``, which needs a protobuf
    runtime. Where none is installed, the vendored minimal runtime
    (``smartpipeline_spark/vendor`` — wire format implemented from the
    public spec, scoped to the state protocol's field types) is first
    provisioned into a writable site-packages (see
    :func:`provision_protobuf` — reaches workers forked by ANY JVM),
    falling back to adding the vendor dir to ``sys.path`` and
    appending it to ``$PYTHONPATH`` so workers forked by a JVM
    launched *after* this call inherit it. A real protobuf anywhere
    earlier on the path wins: the vendor portion is namespace-style
    and only consulted when the import fails elsewhere.

    Returns True when google.protobuf is importable afterwards."""
    import importlib
    import sys

    if _protobuf_importable():
        return True
    # a negative find_spec can be a STALE FileFinder directory cache
    # (site-packages mutated by another process within mtime
    # granularity — e.g. a provision/unprovision roundtrip elsewhere);
    # refresh the finders before concluding the runtime is missing
    importlib.invalidate_caches()
    if _protobuf_importable():
        return True
    if provision_protobuf() is not None:
        return True
    vendor = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vendor")
    if vendor not in sys.path:
        sys.path.append(vendor)
    pp = os.environ.get("PYTHONPATH", "")
    if vendor not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (pp + os.pathsep + vendor) if pp else vendor
    return _protobuf_importable()


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
