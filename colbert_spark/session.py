"""SparkSession factory tuned for this engine.

Local mode stands in for a multi-executor cluster: partitioning decisions
(`spark.sql.shuffle.partitions`, AQE, skew-join handling) are made as they
would be at cluster scale; tests only shrink the data, not the plan shape.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _default_driver_mem() -> str:
    """Local mode sizes the driver heap like an executor fleet (it IS the
    fleet), but never beyond what the host can give: min(48g, 60% of
    MemTotal). Overridable via SPARK_GRAFT_DRIVER_MEM."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gb = int(line.split()[1]) / (1024 * 1024)
                    return f"{max(2, min(48, int(total_gb * 0.6)))}g"
    except OSError:
        pass
    return "8g"


def get_spark(
    app_name: str = "colbert_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    AQE is on (runtime re-planning, partition coalescing, skew-join splits),
    Arrow is on (all pandas-UDF exchange is Arrow-batched), session timezone
    pinned to UTC so timestamp comparisons against the DuckDB oracle are
    stable.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # FAIR scheduling: the index build submits independent sink jobs from
        # concurrent driver threads; FAIR lets their tasks interleave instead
        # of head-of-line blocking behind the big segment job
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches: the pandas kernels are O(batch) with small
        # constants, so fewer/larger batches cut per-batch overhead
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        # commit algorithm v2: task outputs move to the destination at task
        # commit instead of a serial driver-side rename pass at job commit —
        # the v1 rename loop is pure driver dead-time that grows with task
        # count (i.e. anti-scales with parallelism)
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # local mode: the driver heap IS the executor heap for every task
        # thread — size it like an executor fleet, not a driver (8g across 32
        # sort tasks spills constantly and anti-scales with parallelism),
        # bounded by physical RAM so imports on small hosts still run
        .config("spark.driver.memory", _default_driver_mem())
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # ops knobs for scratch-constrained hosts: relocate shuffle/spill scratch
    # (SPARK_GRAFT_LOCAL_DIR) and trade shuffle CPU for bytes
    # (SPARK_GRAFT_IO_CODEC=zstd ≈ 1.5-2× smaller than the lz4 default —
    # the difference between fitting and ENOSPC for a 10M-doc build's
    # exchange on a small scratch volume; on a real cluster this is
    # spark.io.compression.codec in spark-defaults)
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    io_codec = os.environ.get("SPARK_GRAFT_IO_CODEC")
    if io_codec:
        builder = builder.config("spark.io.compression.codec", io_codec)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
