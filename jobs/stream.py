"""spark-submit job: INCREMENTAL topographic correction over an
append-only image directory (Structured Streaming, exactly-once).

    spark-submit --master local[32] --py-files dist/terraspark.zip \\
        jobs/stream.py --images-dir /data/images_in \\
        --data-dir /tmp/terraspark_bench/n128 \\
        --out /tmp/corrected_stream --checkpoint /tmp/stream_ckpt \\
        --methods cosine_t

Each invocation drains files not yet recorded in the checkpoint
(availableNow trigger) and appends their corrected tiles to --out; rerun
after new files land to process only the delta.  Crash mid-batch and
rerun: the streaming WAL replays the batch, output is per-batch-id
idempotent (see terraspark.streaming docstring).
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images-dir", required=True,
                    help="append-only dir of image parquet files")
    ap.add_argument("--data-dir", required=True,
                    help="dir with scenes/dem parquet (static dims)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--methods", default="cosine_t")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("terraspark-stream").getOrCreate()

    from terraspark import streaming
    from terraspark.config import METHODS

    methods = METHODS if args.methods == "all" else \
        tuple(args.methods.split(","))
    unknown = [m for m in methods if m not in METHODS]
    if unknown:
        sys.exit(f"unknown method(s) {unknown}; valid: {', '.join(METHODS)}")

    scenes = spark.read.parquet(f"{args.data_dir}/scenes.parquet")
    dem = spark.read.parquet(f"{args.data_dir}/dem.parquet")

    t0 = time.time()
    streaming.stream_correct(
        spark, args.images_dir, scenes, dem, args.out, args.checkpoint,
        methods=methods, max_files_per_trigger=args.max_files_per_trigger)
    n = spark.read.parquet(args.out).count()
    wall = time.time() - t0
    print(json.dumps({"corrected_rows_total": n,
                      "wall_sec": round(wall, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
