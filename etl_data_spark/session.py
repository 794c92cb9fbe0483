"""SparkSession factory tuned for both local testing and cluster scale.

Replaces the reference's DB bootstrap (reference: data-pipeline/src/
init_database.py:20-380) — there is no server to connect to; the session IS
the engine. Config defaults are chosen for the 100 TB design point:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing);
- shuffle partitions sized to cores locally — on a real cluster AQE's
  ``advisoryPartitionSizeInBytes`` makes the initial number mostly moot;
- Arrow enabled so the Pandas-UDF slow path is batch-vectorized;
- UTC session timezone so date/timestamp semantics match columnar files and
  external oracles regardless of host timezone;
- broadcast threshold left at default 10 MB — dimension tables here are
  orders of magnitude smaller; explicit ``F.broadcast`` hints are still used
  at call sites so intent survives statistics loss (and corpus-sized join
  sides carry explicit ``merge`` hints so a misestimate can never promote
  them to broadcast — operators/dedup.py);
- local driver heap sized to the machine (``SPARK_GRAFT_DRIVER_MEM``,
  default 16g) — in ``local[*]`` the driver JVM IS every executor, and
  Spark's 1g default makes 32 task threads share one gigabyte, which
  spills constantly and OOMs the first scaled-up broadcast build. Only
  applied when this factory launches the JVM (driver memory cannot change
  on an already-running session) and never on a real cluster master.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "etl-data-spark"


def _local_cores() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))


def _local_driver_mem() -> str:
    """Default local driver heap: min(16g, ~70% of MemAvailable).

    ``SPARK_GRAFT_DRIVER_MEM`` overrides. The floor is 1g (Spark's own
    default); on small CI/cgroup hosts asking for a fixed 16g would fail
    JVM launch or draw the OOM killer, so the default is derived from
    what the host actually has. Note the setting only applies when THIS
    factory launches the JVM — getOrCreate() against an existing session
    silently keeps the original heap.
    """
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as f:
            kb = next(
                int(line.split()[1])
                for line in f
                if line.startswith("MemAvailable:")
            )
        gb = max(1, min(16, int(kb * 0.7 / 1024 / 1024)))
    except (OSError, StopIteration, ValueError):
        gb = 4  # no /proc (macOS/container quirk): modest, safe default
    return f"{gb}g"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    On a cluster, pass ``master=None`` and let spark-submit supply the
    master; locally defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cores = _local_cores()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
    )
    local = master.startswith("local") if master is not None else not os.environ.get("SPARK_MASTER")
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cores}]")
    if local:
        builder = builder.config("spark.driver.memory", _local_driver_mem())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # Reliable-checkpoint root for iterative operators (caching.
    # truncate_lineage): on a cluster point this at durable shared storage
    # (HDFS/S3) so per-round state survives executor loss; unset, the
    # iterative operators fall back to localCheckpoint. cleanCheckpoints
    # lets the ContextCleaner delete checkpoint files once their RDD is
    # GC'd — without it a 20-round contraction leaves ~20 full edge-set
    # snapshots on durable storage per run, forever. (Config must be set
    # before the context starts, hence here and not post-getOrCreate.)
    ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt:
        builder = builder.config(
            "spark.cleaner.referenceTracking.cleanCheckpoints", "true"
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if ckpt and not spark.sparkContext.getCheckpointDir():
        # getOrCreate may have returned a PRE-EXISTING context, in which
        # case the cleanCheckpoints conf above was silently ignored (it
        # only applies at context start) and reliable checkpoints written
        # by truncate_lineage would accumulate on durable storage forever.
        # Detect that case and warn rather than configure a leak silently.
        applied = (
            spark.sparkContext.getConf().get(
                "spark.cleaner.referenceTracking.cleanCheckpoints", "false"
            )
            == "true"
        )
        if not applied:
            warnings.warn(
                "SPARK_GRAFT_CHECKPOINT_DIR is set but the SparkContext "
                "already existed, so spark.cleaner.referenceTracking."
                "cleanCheckpoints could not be enabled; checkpoint files "
                f"under {ckpt!r} will NOT be auto-deleted. Stop the "
                "existing context (or set the conf on it at creation) to "
                "get self-cleaning checkpoints.",
                RuntimeWarning,
                stacklevel=2,
            )
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark
