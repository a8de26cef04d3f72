"""SparkSession factory with the engine's standard configuration.

Defaults are tuned for the sandbox (local[32], 128 GiB, single JVM) but the
same knobs are what a 1000-executor cluster run would set: AQE on (runtime
skew-join + coalesce), Arrow on (every pandas UDF stage ships Arrow record
batches), shuffle partitions sized to cores, UTC session timezone so
timestamps round-trip identically against external oracles.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pagerank_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so the
    bench harness can pin parallelism; on a real cluster pass ``None`` and
    let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # size shuffles to the available parallelism, not the 200 default
        ncores = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if ncores == "*" else max(8, int(ncores))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Fault-avoidance: first-touch page faults serialize badly on
        # virtualized hosts (measured: fresh-allocation bandwidth collapses
        # from 5 GB/s at 1 proc to ~1 GB/s aggregate at any parallelism,
        # while pre-faulted steady-state scales to >300 GB/s). Pre-touch the
        # JVM heap once at startup, and keep glibc from returning Python
        # workers' buffers to the OS between Arrow batches.
        .config(
            "spark.driver.extraJavaOptions",
            "-Xms4g -XX:+AlwaysPreTouch -XX:+UseG1GC",
        )
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "268435456")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "268435456")
        .config("spark.executorEnv.MALLOC_ARENA_MAX", "2")
        # Heartbeat resilience: on this hypervisor-stalled host (22s+ soft
        # lockups under 32-way load) the executor->driver heartbeat RPC can
        # fail repeatedly during a long pack/UDF stage (observed:
        # RpcEndpointNotFoundException every interval until the executor
        # self-terminated at 60 misses, killing a healthy 2B-edge job). A
        # missed heartbeat in local mode carries no liveness information —
        # executor and driver share the process — so tolerate long outages
        # rather than suiciding mid-stage.
        .config("spark.executor.heartbeatInterval", "20s")
        .config("spark.executor.heartbeat.maxFailures", "1000")
        .config("spark.network.timeout", "600s")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # Belt-and-braces for local mode: Python worker daemons fork from the
    # driver JVM, which inherits THIS process's environment — set the malloc
    # knobs here too so they hold regardless of how executorEnv propagates.
    # Threshold 256 MiB > any engine batch buffer => large numpy temporaries
    # come from the reused brk heap, never fresh mmaps (whose first-touch
    # faults serialize on this virtualized host); trim threshold keeps the
    # freed heap resident between batches.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "268435456")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")
    os.environ.setdefault("MALLOC_ARENA_MAX", "2")
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def package_zip(dest_dir: str = "/tmp") -> str:
    """Zip the pagerank_spark package for spark-submit --py-files / addPyFile."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(dest_dir, "pagerank_spark_pkg.zip")
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as z:
        for root, _, files in os.walk(pkg_dir):
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.join(
                    "pagerank_spark", os.path.relpath(full, pkg_dir)
                )
                z.write(full, rel)
    os.replace(tmp, out)
    return out


def _ship_package(spark: SparkSession) -> None:
    """Make pagerank_spark importable on executors regardless of driver cwd.

    Executor Python workers do not inherit the driver's sys.path; shipping the
    package as a py-file is the same mechanism a cluster run uses
    (spark-submit --py-files pagerank_spark_pkg.zip)."""
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added in this context, or a non-filesystem deploy
