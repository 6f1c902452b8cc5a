"""spark-submit job: DEM hydrology stack -- flow direction ->
accumulation -> watershed -> ruggedness -> flow length -> Strahler
stream order, staged and resumable, output committed as an
Iceberg-style snapshot table.

Usage:

    python scripts/make_zip.py                      # -> dist/terraspark.zip
    spark-submit --master local[8] \\
        --py-files dist/terraspark.zip \\
        jobs/hydro.py --data-dir /tmp/terraspark_bench/n32 \\
        --out /tmp/hydro_out --checkpoint-root /tmp/hydro_ckpt

The per-cell elevation reduction runs through the lineage layer
(StageRunner: bucket-granular manifest commits, anti-join resume), the
downstream routing/closure operators derive from it, and the final
table is committed with terraspark.snapshots.SnapshotTable -- each run
commits a NEW overwrite snapshot that supersedes (never duplicates) the
previous run's rows, while earlier runs stay readable via time travel.
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True,
                    help="dir with dem parquet (dem.parquet)")
    ap.add_argument("--out", required=True,
                    help="snapshot-table root for the hydrology output")
    ap.add_argument("--checkpoint-root", default=None,
                    help="lineage root: resume elevation stage from manifest")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--stream-threshold", type=int, default=5,
                    help="flow-accumulation threshold for the stream "
                         "network (Strahler order)")
    ap.add_argument("--derived", action="store_true",
                    help="also compute the derived layers: Planchon-"
                         "Darboux fill depth, topographic wetness "
                         "index, and sky-view factor")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = SparkSession.builder.appName("terraspark-hydro").getOrCreate()

    from terraspark import hydro
    from terraspark.snapshots import SnapshotTable

    dem = spark.read.parquet(f"{args.data_dir}/dem.parquet")
    t0 = time.time()

    if args.checkpoint_root:
        from terraspark.lineage import StageRunner
        runner = StageRunner(spark, args.checkpoint_root,
                             buckets=args.buckets)
        elev = runner.run_stage_batched(
            "cell_elevation", dem, hydro.cell_elevation,
            key_cols=["dem_id", "cell"])
    else:
        elev = hydro.cell_elevation(dem)
    elev = elev.localCheckpoint()           # shared by all four operators

    flow = hydro.flow_direction(elev).localCheckpoint()
    acc = hydro.flow_accumulation(flow).localCheckpoint()
    basins = hydro.watershed(flow)
    tri = hydro.ruggedness(elev)
    flen = hydro.flow_length(flow)
    order = hydro.strahler(flow, acc, threshold=args.stream_threshold) \
        .select("dem_id", "cell", "strahler")

    result = (flow
              .join(acc, ["dem_id", "cell"])
              .join(basins, ["dem_id", "cell"])
              .join(tri, ["dem_id", "cell"], "left")
              .join(flen, ["dem_id", "cell"], "left")
              .join(order, ["dem_id", "cell"], "left"))
    if args.derived:
        fill = hydro.fill_sinks(elev).select("dem_id", "cell",
                                             "fill_depth")
        twi = hydro.wetness_index(flow, acc).select("dem_id", "cell",
                                                    "twi")
        svf = hydro.sky_view_factor(elev).select("dem_id", "cell", "svf")
        result = (result.join(fill, ["dem_id", "cell"], "left")
                  .join(twi, ["dem_id", "cell"], "left")
                  .join(svf, ["dem_id", "cell"], "left"))

    tbl = SnapshotTable(spark, args.out)
    snap = tbl.overwrite(result)

    summary = result.agg(
        F.count("*").alias("cells"),
        F.sum(F.when(F.col("flow_dir") < 0, 1).otherwise(0)).alias("pits"),
        F.count_distinct("basin").alias("basins"),
        F.max("acc").alias("max_drainage"),
        F.max("flen").alias("max_flow_length"),
        F.sum(F.when(F.col("strahler").isNotNull(), 1).otherwise(0))
        .alias("stream_cells"),
        F.max("strahler").alias("max_order")).collect()[0]
    line = {
        "cells": summary["cells"], "pits": int(summary["pits"]),
        "basins": summary["basins"],
        "max_drainage": int(summary["max_drainage"]),
        "max_flow_length": float(summary["max_flow_length"] or 0.0),
        "stream_cells": int(summary["stream_cells"]),
        "max_order": int(summary["max_order"] or 0),
        "snapshot": snap, "wall_sec": round(time.time() - t0, 2)}
    if args.derived:
        drv = result.agg(
            F.round(F.sum("fill_depth"), 4).alias("fill_volume"),
            F.round(F.max("twi"), 4).alias("max_twi"),
            F.round(F.min("svf"), 4).alias("min_svf")).collect()[0]
        line.update(fill_volume=float(drv["fill_volume"] or 0.0),
                    max_twi=float(drv["max_twi"] or 0.0),
                    min_svf=float(drv["min_svf"] or 0.0))
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
