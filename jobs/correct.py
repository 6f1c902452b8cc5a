"""spark-submit job: topographic correction over image + DEM parquet tables.

Usage (north rule: ship the package with --py-files):

    python scripts/make_zip.py                       # -> dist/terraspark.zip
    spark-submit --master local[32] \\
        --py-files dist/terraspark.zip \\
        jobs/correct.py --data-dir /tmp/terraspark_bench/n128 \\
        --out /tmp/corrected --methods cosine_t,c_correction \\
        --checkpoint-root /tmp/ckpt    # optional: resumable stages

With --checkpoint-root the kernel stage runs through the lineage layer
(terraspark.lineage.StageRunner): killed runs resume from the manifest,
re-processing only uncommitted buckets.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True,
                    help="dir with images/scenes/dem parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--methods", default="all")
    ap.add_argument("--checkpoint-root", default=None)
    ap.add_argument("--buckets", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("terraspark-correct").getOrCreate()

    from terraspark import corrections
    from terraspark.config import METHODS
    from terraspark.pipeline import TopoEngine

    methods = METHODS if args.methods == "all" else \
        tuple(args.methods.split(","))
    unknown = [m for m in methods if m not in METHODS]
    if unknown:
        sys.exit(f"unknown method(s) {unknown}; valid: {', '.join(METHODS)}")

    images = spark.read.parquet(f"{args.data_dir}/images.parquet")
    scenes = spark.read.parquet(f"{args.data_dir}/scenes.parquet")
    dem = spark.read.parquet(f"{args.data_dir}/dem.parquet")

    eng = TopoEngine(spark)
    t0 = time.time()
    joined = eng.joined(images, scenes, dem)

    # scalar stats are themselves checkpointed: a resumed run reloads them
    # instead of re-aggregating the whole tile table
    sc = None
    if args.checkpoint_root:
        import os
        sc_path = os.path.join(args.checkpoint_root, "scalars.parquet")
        if os.path.exists(sc_path):
            import pandas as pd
            sc = pd.read_parquet(sc_path)
    if sc is None:
        sc = eng.scalars(joined)
        if args.checkpoint_root:
            import os
            os.makedirs(args.checkpoint_root, exist_ok=True)
            sc.to_parquet(os.path.join(args.checkpoint_root,
                                       "scalars.parquet"), index=False)

    def kernel_stage(df):
        return corrections.apply_corrections(df, sc, methods, eng.params,
                                             eng.tile)

    if args.checkpoint_root:
        from terraspark.lineage import StageRunner
        runner = StageRunner(spark, args.checkpoint_root, args.buckets)
        # bucket key must exist on input AND output (method rides along:
        # all methods of a tile land in the tile's bucket)
        corrected = runner.run_stage_batched(
            "correct", joined, kernel_stage,
            ["image_id", "band", "tile_x", "tile_y"])
        corrected.write.mode("overwrite").parquet(args.out)
        lineage = runner.manifest("correct")
    else:
        corrected = kernel_stage(joined)
        corrected.write.mode("overwrite").parquet(args.out)
        lineage = []

    n = spark.read.parquet(args.out).count()
    wall = time.time() - t0
    print(json.dumps({"corrected_rows": n, "wall_sec": round(wall, 2),
                      "tiles_per_sec": round(n / wall, 1),
                      "lineage_partitions": len(lineage)}))
    spark.stop()


if __name__ == "__main__":
    main()
