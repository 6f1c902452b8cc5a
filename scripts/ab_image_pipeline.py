"""A/B probe: image-pipeline wall time under candidate session configs.

Usage: python scripts/ab_image_pipeline.py '<json of extra confs>' [reps]

Runs bench.py's run_image_pipeline (+ phash dedup) on the standard bench
tables in a fresh session with the given confs and prints one JSON line.
Each variant should be run as a separate process (fresh JVM).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    extra = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    java_opts = extra.pop("_java_options", None)

    from pyspark.sql import SparkSession
    import bench
    from terraspark.session import build_session

    data_dir = bench.ensure_bench_tables(512)

    # mirror build_session but layer on the extra confs
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    b = SparkSession.builder
    if java_opts:
        b = b.config("spark.driver.extraJavaOptions", java_opts)
    for k, v in extra.items():
        b = b.config(k, v)
    # build_session applies its defaults on top of the same builder chain
    # (getOrCreate merges); simplest: set extras via builder then call it
    import terraspark.session as S
    orig = S.SparkSession.builder
    S.SparkSession.builder = b
    try:
        spark = build_session("ab-image", cores=32, max_partition_bytes="8m")
    finally:
        S.SparkSession.builder = orig

    out = {"confs": extra, "java": java_opts or ""}
    runs = []
    for _ in range(reps):
        r = bench.run_image_pipeline(spark, data_dir)
        t = bench.run_phash_dedup(spark, data_dir)
        r["t_phash"] = t
        runs.append(r)
    out["runs"] = runs
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory \
        .getGarbageCollectorMXBeans()
    out["gc_ms"] = sum(beans.get(i).getCollectionTime()
                       for i in range(beans.size()))
    out["gc_names"] = [beans.get(i).getName() for i in range(beans.size())]
    spark.stop()
    print("ABRESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
