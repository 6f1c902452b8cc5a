"""Per-query isolation bench (guide section 1.4): times a chosen subset of
the frozen bench.py phases with repeats, identical timing methodology
(construction + full-column hash action), labeled jobs, and a numpy
calibration probe before/after so throttled windows are visible.

Usage:
  python bench_extra.py q1 q2 ... [--reps N]
  python bench_extra.py --image            # image pipeline phases only

Prints one JSON line: {"queries": {name: [sec, ...]}, "cal": [pre, post]}.
bench.py itself stays frozen -- this file only adds isolation runs.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _cal() -> float:
    """1-s-scale numpy probe: wall seconds for a fixed workload."""
    import numpy as np
    a = np.random.default_rng(0).random((2048, 2048), dtype=np.float32)
    t0 = time.time()
    for _ in range(3):
        a = a @ a
        a /= np.abs(a).max()
    return round(time.time() - t0, 3)


def main():
    args = [a for a in sys.argv[1:]]
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    image_mode = "--image" in args
    names = [a for a in args if not a.startswith("--")]

    from pyspark.sql import functions as F
    import bench
    from terraspark.session import build_session
    import __spark_entry__ as E

    pre = _cal()
    spark = build_session("terraspark-bench-extra", cores=CPUS,
                          max_partition_bytes="8m")
    out: dict[str, list[float]] = {}
    if image_mode:
        data_dir = bench.ensure_bench_tables(
            int(os.environ.get("TERRASPARK_BENCH_IMAGES", "512")))
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"image_pipeline rep{r}")
            img = bench.run_image_pipeline(spark, data_dir, warmup=(r == 0))
            for k in ("t_join", "t_stats", "t_correct", "t_total"):
                out.setdefault(k, []).append(img[k])
            spark.sparkContext.setJobDescription(f"phash rep{r}")
            out.setdefault("t_phash", []).append(
                bench.run_phash_dedup(spark, data_dir))
    if names:
        qs = E.queries()
        # one warmup query so JVM/python pools are up before timing
        qs["dp_dedup_exact"](spark, SF_DIR).agg(F.count("*")).collect()
        for name in names:
            for r in range(reps):
                spark.sparkContext.setJobDescription(f"{name} rep{r}")
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                df.agg(F.count("*"),
                       F.expr("bit_xor(xxhash64("
                              + ", ".join(df.columns) + "))")).collect()
                out.setdefault(name, []).append(round(time.time() - t0, 3))
    spark.stop()
    post = _cal()
    print("EXTRA " + json.dumps({"queries": out, "cal": [pre, post],
                                 "reps": reps}))


if __name__ == "__main__":
    main()
