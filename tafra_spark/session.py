"""SparkSession factory.

Local-mode defaults tuned for the test container (``local[$SPARK_GRAFT_CPUS]``)
but every knob is chosen to survive a real multi-executor cluster:

- AQE on (runtime coalescing + skew-join splitting) so shuffle partition
  counts self-tune at 100 TB.
- Arrow enabled for every pandas interchange (ingest + Pandas UDFs).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- Parquet filter pushdown + vectorized reader on explicitly.

The reference (tafra) has no session concept — it is a single-process
numpy library (see SURVEY.md §3) — so this module is pure Spark-side
infrastructure.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


#: minimum free bytes /dev/shm must have before it is auto-selected as
#: the shuffle/spill dir (spills beyond this belong on disk, not RAM)
_TMPFS_MIN_FREE = 16 * 1024**3


def _default_local_dir() -> str:
    """Pick the shuffle/spill local dir.

    Precedence: ``SPARK_GRAFT_LOCAL_DIR`` (explicit path) >
    ``SPARK_GRAFT_TMPFS_LOCAL`` (=1 force tmpfs, =0 force disk) >
    auto: /dev/shm only when it exists AND has ≥16 GiB free —
    RAM-backed local dirs kill the test box's shared-disk IO-wait
    spikes, but a big spill must never OOM the box.
    """
    explicit = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if explicit:
        return explicit
    tmpfs = "/dev/shm/tafra_spark_local"
    disk = "/tmp/tafra_spark_local"
    force = os.environ.get("SPARK_GRAFT_TMPFS_LOCAL")
    if force == "1":
        return tmpfs
    if force == "0":
        return disk
    if os.path.isdir("/dev/shm"):
        try:
            import shutil

            if shutil.disk_usage("/dev/shm").free >= _TMPFS_MIN_FREE:
                return tmpfs
        except OSError:
            pass
    return disk


def get_spark(
    app_name: str = "tafra_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with scale-ready defaults.

    In local mode there is a single JVM; ``spark.driver.memory`` is the
    only memory knob that matters and must be set before JVM start.
    """
    cpus = _cpus()
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at its default (true): size-based
        # coalescing ("false", the docs' production advice) was A/B
        # tested and LOST here — the dedup pipelines' persisted tables
        # are small in BYTES (hashed longs) but CPU-heavy to consume
        # (array_intersect verify), and size-based coalescing collapses
        # them to 1-2 partitions, serializing exactly the stages that
        # need all 32 cores
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # delay scheduling buys nothing when every slot reads the same
        # storage: in local mode all data is process-local, and on the
        # cloud object-store clusters this targets there is no HDFS
        # block locality to wait for — 0 is the standard production
        # setting there too (the 3 s default serializes task waves
        # whenever slots are briefly busy; measured -14% on the
        # sub-second query set here)
        .config("spark.locality.wait", "0ms")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # string-heavy dedup stages (shingle arrays) are allocation-bound
        # in local mode: a larger young gen cuts multi-second GC spikes
        # that dominate run-to-run variance. Still env-overridable.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        # whole-stage codegen emits one compiled class per stage; a
        # many-query session overflows the JVM's default 240 MB code
        # cache and the resulting flush/recompile storms showed up as
        # roaming 2-5x per-query spikes in the r5 bench A/Bs. A larger
        # reserved cache removes the flushing, not the JIT itself.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS", "-XX:ReservedCodeCacheSize=512m"
            ),
        )
        # shuffle/spill files on tmpfs when available: the test box's
        # disk shows multi-second intermittent IO-wait stalls (shared
        # host), which roamed through bench runs as 2-10x per-query
        # spikes. RAM-backed local dirs are also what a production
        # cluster does (NVMe/ramdisk shuffle volumes); spills stay
        # possible, they just don't hit a contended spindle.
        # tmpfs is only safe when there is real headroom: a large
        # shuffle spill on RAM-backed storage would exhaust it and
        # abort jobs that succeed on disk, so fall back to /tmp unless
        # /dev/shm has ample free space (or the user forces it with
        # SPARK_GRAFT_TMPFS_LOCAL=1/0).
        .config("spark.local.dir", _default_local_dir())
        # bucketed tables (co-located joins) need a warehouse; keep it out
        # of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/tafra_spark_warehouse"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.pandas.structHandlingMode", "row")
    )
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
