"""SparkSession factory and configuration.

The reference connects to Iceberg REST/Glue catalogs (catalog.rs:154-246);
in Spark those become catalog-plugin configs on the session builder (SURVEY
§2.1 S1-S2). This module builds a session tuned for large-scale work and
also knows how to *retune* an externally-owned session (the verify driver
passes its own) with the dynamic confs we rely on.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Dynamic SQL confs safe to set on a live session. Keep this list additive
# and side-effect-light: the driver may hand us a shared session.
_DYNAMIC_CONFS: dict[str, str] = {
    # events.parquet stores TIMESTAMP(NANOS); Spark has no ns timestamp —
    # read as long and convert (io.load_table does the conversion).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock semantics matching the DuckDB oracle
    # (naive timestamps interpreted as UTC).
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
    # ones — essential at 100 TB, harmless locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / mapInPandas path (the [EXT] operators).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


# one package zip per driver process (rebuilt each run so workers never
# see stale code from an earlier process's temp file)
_SHIP_STATE: dict = {}


def _ship_package(spark: SparkSession) -> None:
    """Make ``hielo_spark`` importable on executors regardless of how the
    driver found it (addPyFile of a package zip — the standard way to ship
    a Python package to a cluster). Without this, any module-level
    function captured by a mapInPandas/applyInPandas closure unpickles on
    the worker via ``import hielo_spark`` and fails when the host driver
    added the repo to sys.path only in-process (e.g. a harness running
    from another directory)."""
    try:
        ctx = spark.sparkContext
        app = ctx.applicationId
        if _SHIP_STATE.get(app):
            return
        if "zip" not in _SHIP_STATE:
            import os
            import shutil
            import tempfile

            pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            base = os.path.join(
                tempfile.mkdtemp(prefix="hielo_ship_"), "hielo_spark_pkg"
            )
            _SHIP_STATE["zip"] = shutil.make_archive(
                base, "zip", root_dir=pkg_root, base_dir="hielo_spark"
            )
        ctx.addPyFile(_SHIP_STATE["zip"])
        _SHIP_STATE[app] = True
    except Exception:
        # never fail session setup over shipping; worker imports may still
        # succeed via the environment's own PYTHONPATH
        pass


def configure(spark: SparkSession) -> SparkSession:
    """Apply dynamic confs to an existing session (driver-owned or ours)."""
    _ship_package(spark)
    for k, v in _DYNAMIC_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Never fail hard on a conf the host session forbids.
            pass
    # The NTZ→timestamp cast in the loaders is instant-preserving only under
    # a UTC session TZ; if the host session forbade the conf, say so loudly
    # instead of silently shifting every timestamp by the JVM default TZ.
    try:
        tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:
        tz = None
    if tz != "UTC":
        import warnings

        warnings.warn(
            f"spark.sql.session.timeZone={tz!r} (wanted UTC): TIMESTAMP_NTZ "
            "casts will shift instants by the session TZ",
            RuntimeWarning,
            stacklevel=2,
        )
    return spark


def get_spark(
    app_name: str = "hielo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Locally we run ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the same
    code runs unmodified — partitioning/broadcast decisions below are sized
    by conf, not hard-coded.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("HIELO_SHUFFLE_PARTITIONS", cpus))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("HIELO_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # PySpark 4 captures the user call site on EVERY DataFrame/Column
        # op (errors/utils._capture_call_site: a Python stack walk + JVM
        # origin update, for richer error messages). On build-heavy
        # queries that is pure driver-side overhead — interleaved A/B
        # (r13 session 3): meta_health construction 0.687 → 0.260 s,
        # every other query −30-65 ms. Static conf, so set at build; the
        # only cost is less precise call-site info in error messages.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    # Scale knobs (r13, guide §2.2/§2.3): env-parameterised with LOCAL
    # DEFAULTS UNCHANGED so the driver's bench stays comparable; set in
    # production, where the values depend on data volume, not core count.
    # - HIELO_INITIAL_PARTITIONS → AQE's pre-coalesce partition count.
    #   Locally shuffle.partitions == cores is right; at 100 TB the
    #   initial count must be high (≈ input_bytes / 128 MB) and AQE
    #   coalesces DOWN to advisoryPartitionSizeInBytes — it can never
    #   split an undersized initial count (skew-join splitting aside).
    # - HIELO_IO_CODEC → shuffle/spill compression codec. lz4 (Spark
    #   default) locally where shuffles are KB-sized and CPU-bound; zstd
    #   in production where shuffles are byte-bound (guide §2.3 — measure
    #   both; there is no universal answer).
    initial = os.environ.get("HIELO_INITIAL_PARTITIONS")
    if initial:
        b = b.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", initial
        )
    codec = os.environ.get("HIELO_IO_CODEC")
    if codec:
        b = b.config("spark.io.compression.codec", codec)
    for k, v in _DYNAMIC_CONFS.items():
        b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    return configure(spark)
