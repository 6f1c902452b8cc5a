"""SparkSession helpers tuned for the tile pipeline.

Arrow batches are the unit of work (the engine's analogue of the
reference's block streaming, /root/reference/util/raster_calc.py:219-241):
one 64x64 float32 tile is 16 KiB, so ~2k tiles/batch keeps Arrow transfers
in the tens of MB -- the pandas-UDF sweet spot.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _heap_gb(mem: str) -> int:
    mem = mem.strip().lower()
    if mem.endswith("g"):
        return int(mem[:-1])
    if mem.endswith("m"):
        return max(1, int(mem[:-1]) // 1024)
    return int(mem)


def _ensure_hugepages(need_gb: int) -> bool:
    """Best-effort: make >= ``need_gb`` of 2 MB huge pages available for
    the JVM heap (vm.nr_hugepages top-up; no-op without privileges).

    Why: on this class of host (microVM, EPT-mediated page faults) a
    first-touch 4 KB fault costs ~100x a bare-metal fault -- measured
    0.4 GB/s page-touch throughput, which turned the first large GC of
    every fresh JVM into a multi-second kernel-time stall (a single young
    pause read User=1.7s Sys=125.6s Real=5.7s: 23 GC threads serialized
    on the fault path while first-touching survivor/old pages).  2 MB
    pages cut the fault count 512x: heap pretouch drops from ~80 s to
    ~1 s, making -Xms + AlwaysPreTouch viable, which in turn removes the
    fault storms from inside GC pauses entirely (measured: image-pipeline
    GC total 31 s -> 2.3 s, first-run t_total 49 s -> 14.5 s).  Returns
    False when pages cannot be reserved (unprivileged host, fragmented
    memory) -- callers then keep lazy heap sizing, identical to the old
    default behavior."""
    need = need_gb * 512 + 256          # 2 MB pages + slack
    try:
        free = _hugepages("HugePages_Free")
        if free >= need:
            return True
        total = _hugepages("HugePages_Total")
        with open("/proc/sys/vm/nr_hugepages", "w") as f:
            f.write(str(total + (need - free)))
        return _hugepages("HugePages_Free") >= need
    except (OSError, ValueError):
        return False


def _hugepages(field: str) -> int:
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith(field):
                return int(line.split()[1])
    return 0


def build_session(app: str = "terraspark", cores: int | None = None,
                  shuffle_partitions: int | None = None,
                  max_partition_bytes: str | None = None) -> SparkSession:
    """``max_partition_bytes`` caps scan-split size (e.g. "8m"): a
    many-file image table then fans decode out across all cores WITHOUT a
    repartition shuffle of the raw bytes (bench/probe use this; the
    default 128m is fine for ordinary relational scans)."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 32)
    driver_mem = os.environ.get("TERRASPARK_DRIVER_MEM", "48g")
    # Throughput collector for the batch pipeline: the image path allocates
    # large short-lived binary buffers (16 KB px blobs, Arrow batches,
    # columnar-cache builders) that G1 classifies as humongous; under CPU
    # contention G1's concurrent cycles stall allocation -- measured 204 s
    # of GC in the single decode+join+persist stage of one bench run
    # (event-log task metrics, OPTIMIZATION_r06.md) vs single-digit
    # seconds with the parallel collector on identical input.  Overridable
    # per deployment (e.g. latency-sensitive streaming -> G1/ZGC).
    #
    # When huge pages are available (see _ensure_hugepages) the heap is
    # additionally pre-sized, pre-touched and staticized: every variant
    # that leaves pages to be faulted lazily on THIS host eventually eats
    # a first-touch storm inside a GC pause (adaptive resizing un-touches
    # every grown space; measured 5-39 s single pauses, >95% kernel
    # time).  MaxTenuringThreshold=1 promotes the few live survivors
    # (block-manager blocks) after one copy instead of bouncing the fat
    # 16 KB buffers between survivor spaces; MetaspaceSize avoids the
    # early metadata-threshold full GCs.  All static sizing derives from
    # TERRASPARK_DRIVER_MEM -- nothing is tuned to a fixture size.
    default_opts = "-XX:+UseParallelGC"
    if _ensure_hugepages(_heap_gb(driver_mem)):
        default_opts = (
            f"-XX:+UseParallelGC -Xms{driver_mem} -XX:+AlwaysPreTouch "
            "-XX:+UseLargePages -XX:-UseAdaptiveSizePolicy "
            "-XX:MaxTenuringThreshold=1 -XX:MetaspaceSize=256m")
    java_opts = os.environ.get("TERRASPARK_JAVA_OPTS", default_opts)
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
        # tile rows are fat (16-64 KB of binary each): 512 rows/batch =
        # ~25 MB Arrow transfers.  Re-measured r6 after the GC/hugepage
        # work (alternating A/B, 3 reps each): 512 beats the former 2048
        # by ~0.3-0.5 s on BOTH fat-tile Python stages (scalar stats
        # 1.4-1.6 vs 1.9-2.3 s; kernels 1.9-2.2 vs 2.4-2.5 s) -- smaller
        # peak allocations and better JVM<->Python pipelining; narrow
        # datapipe rows see no measurable change (their batches are
        # row-count-bounded far below any byte limit)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.driver.memory", driver_mem)
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
    )
    if max_partition_bytes:
        b = b.config("spark.sql.files.maxPartitionBytes",
                     max_partition_bytes) \
             .config("spark.sql.files.openCostInBytes", "1m")
    return b.getOrCreate()
