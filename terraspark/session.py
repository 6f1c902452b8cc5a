"""SparkSession helpers tuned for the tile pipeline.

Arrow batches are the unit of work (the engine's analogue of the
reference's block streaming, /root/reference/util/raster_calc.py:219-241):
one 64x64 float32 tile is 16 KiB, so ~2k tiles/batch keeps Arrow transfers
in the tens of MB -- the pandas-UDF sweet spot.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = "terraspark", cores: int | None = None,
                  shuffle_partitions: int | None = None,
                  max_partition_bytes: str | None = None) -> SparkSession:
    """``max_partition_bytes`` caps scan-split size (e.g. "8m"): a
    many-file image table then fans decode out across all cores WITHOUT a
    repartition shuffle of the raw bytes (bench/probe use this; the
    default 128m is fine for ordinary relational scans)."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 32)
    # Throughput collector for the batch pipeline: the image path allocates
    # large short-lived binary buffers (16 KB px blobs, Arrow batches,
    # columnar-cache builders) that G1 classifies as humongous; under CPU
    # contention G1's concurrent cycles stall allocation -- measured 204 s
    # of GC in the single decode+join+persist stage of one bench run
    # (event-log task metrics, OPTIMIZATION_r06.md) vs single-digit
    # seconds with the parallel collector on identical input.  Overridable
    # per deployment (e.g. latency-sensitive streaming -> G1/ZGC).
    java_opts = os.environ.get("TERRASPARK_JAVA_OPTS", "-XX:+UseParallelGC")
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.driver.extraJavaOptions", java_opts)
        .config("spark.executor.extraJavaOptions", java_opts)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # pin the session timezone: timestamp_ntz -> timestamp casts (e.g.
        # sessionization's gap arithmetic) must not depend on the host TZ
        # -- in a DST zone an un-pinned cast shifts gaps straddling a
        # transition by +-3600s vs the UTC-fixed oracle
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # tile rows are fat (16-64 KB of binary each): ~2k rows/batch keeps
        # Arrow transfers in the tens-of-MB sweet spot (measured optimum;
        # smaller batches pay per-call overhead, larger ones balloon the
        # per-task working set under the 11-method kernel fan-out)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory",
                os.environ.get("TERRASPARK_DRIVER_MEM", "48g"))
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
    )
    if max_partition_bytes:
        b = b.config("spark.sql.files.maxPartitionBytes",
                     max_partition_bytes) \
             .config("spark.sql.files.openCostInBytes", "1m")
    return b.getOrCreate()
