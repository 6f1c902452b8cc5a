"""End-to-end orchestration facade: decode -> tile -> derive -> join ->
correct (-> evaluate).  The Spark-first replacement for the reference's
eager path-based dataflow (SURVEY.md section 3.1)."""
from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

import os

from . import corrections, dem, tiling
from .config import CELL_RES, METHODS, TILE, CorrectionParams, DEFAULT_PARAMS


def _pin(df: DataFrame) -> DataFrame:
    """Materialization strategy for the fat reused tables (joined tiles,
    DEM features).

    Default ``checkpoint``: localCheckpoint stores the partitions'
    UnsafeRows directly as block-manager blocks.  ``persist`` routes
    through the columnar InMemoryRelation cache instead, whose per-batch
    column builders re-buffer every 16 KB pixel blob through growing
    byte arrays -- measured both slower to build (4.1 s vs 2.8 s warm,
    12.5 vs 5.4 cold at 512 images) and slower to read back
    (decompress + row reassembly), and the builder churn is what drove
    the GC stalls in the decode+join stage (OPTIMIZATION_r06.md).  The
    trade is lineage truncation: on a cluster, losing an executor under
    ``checkpoint`` fails the job instead of recomputing -- set
    TERRASPARK_CACHE_MODE=persist for long multi-tenant runs where that
    matters more than throughput.  Streaming plans cannot checkpoint and
    always take the persist path."""
    if df.isStreaming or \
            os.environ.get("TERRASPARK_CACHE_MODE", "checkpoint") == "persist":
        return df.persist(StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint(eager=False)


class TopoEngine:
    """One correction run over an image table + DEM table.

    Mirrors the reference lifecycle (TopoCorrectionAlgorithm.process:
    init -> per-band process -> merge,
    /root/reference/processing_alg/topocorrection/TopoCorrectionAlgorithm.py:47-60)
    as: persist joined tiles -> distributed scalar stats -> kernel map.
    """

    def __init__(self, spark: SparkSession,
                 params: CorrectionParams = DEFAULT_PARAMS,
                 tile: int = TILE, cell_res: int = CELL_RES,
                 bands: int = 4, broadcast_dem: bool = True):
        self.spark = spark
        self.params = params
        self.tile = tile
        self.cell_res = cell_res
        self.bands = bands
        self.broadcast_dem = broadcast_dem
        self._joined: DataFrame | None = None
        self._features: DataFrame | None = None

    # ------------------------------------------------------------ stages
    def tiles(self, images: DataFrame, scenes: DataFrame) -> DataFrame:
        return tiling.tile_images(images, scenes, self.tile, self.cell_res,
                                  self.bands)

    def dem_features(self, dem_df: DataFrame, persist: bool = True) -> DataFrame:
        feats = dem.derive_features(dem_df, self.params, self.tile)
        if persist:
            feats = _pin(feats)
        self._features = feats
        return feats

    def joined(self, images: DataFrame, scenes: DataFrame,
               dem_df: DataFrame, persist: bool = True) -> DataFrame:
        tiles = self.tiles(images, scenes)
        # Features derived here feed exactly ONE consumer: the broadcast
        # side of join_dem (the joined output is itself pinned below, so
        # nothing re-reads the feature table).  Pinning it too would add a
        # full write+read of the fat (slope, aspect, lum) binaries for no
        # reuse, and join_dem only projects slope+lum -- an opaque
        # mapInPandas output cannot be column-pruned, so the aspect bytes
        # are dropped at the source (emit_aspect=False).  Callers that
        # want the reusable, persisted, aspect-bearing table (hillshade,
        # feature stats, streaming) call dem_features() first; joined()
        # then uses that instead.
        feats = self._features
        if feats is None:
            feats = dem.derive_features(dem_df, self.params, self.tile,
                                        emit_aspect=False)
            self._features = feats
        j = corrections.join_dem(tiles, feats, self.broadcast_dem)
        # Conditional repartition before the (reused) persist, same guard
        # as tiling.tile_images: a many-split production scan already
        # spreads tiles uniformly (row counts per split are fixed by the
        # images it decodes -- hot CELLS stack images on one key but never
        # skew per-split row counts, and the broadcast DEM join preserves
        # the scan partitioning), so repartitioning there would shuffle
        # the FAT joined rows (px + lum + slope ~48 KB each; ~1.6 GB at
        # 512 images, the single largest avoidable data movement in the
        # pipeline).  Downstream stages don't need the exchange either:
        # scalar stats fold partials in canonical order (partition-
        # invariant by construction) and the kernel stage groups with a
        # narrow in-partition sort.  Only shuffle when the scan is too
        # narrow to keep the cores busy (tiny local inputs), keyed by tile
        # identity to spread FIXTURES.md's hot anchor cell across tasks.
        target = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        cores = self.spark.sparkContext.defaultParallelism
        if (not images.isStreaming
                and images.rdd.getNumPartitions() < min(cores, target)):
            j = j.repartition(target,
                              "image_id", "band", "tile_x", "tile_y")
        if persist:
            j = _pin(j)
        self._joined = j
        return j

    def scalars(self, joined: DataFrame) -> pd.DataFrame:
        return corrections.band_stats(joined, self.params, self.tile)

    def scalars_df(self, joined: DataFrame) -> DataFrame:
        """Never-collect scalar table (the 10^12-image path)."""
        return corrections.band_stats_df(joined, self.params, self.tile)

    def correct(self, images: DataFrame, scenes: DataFrame, dem_df: DataFrame,
                methods: Sequence[str] = METHODS,
                collect_scalars: bool = False) -> DataFrame:
        """collect_scalars=False (default) keeps the scalar regression
        table fully distributed -- required beyond one driver's worth of
        images; True mirrors the reference's driver-side init phase."""
        j = self._joined or self.joined(images, scenes, dem_df)
        sc = self.scalars(j) if collect_scalars else self.scalars_df(j)
        return corrections.apply_corrections(j, sc, methods, self.params,
                                             self.tile)

    def unpersist(self):
        for df in (self._joined, self._features):
            if df is not None:
                df.unpersist()
        self._joined = self._features = None


def correction_summary(corrected: DataFrame, tile: int = TILE,
                       round_to: int = 3) -> DataFrame:
    """Per (image, band, method) valid count + rounded mean of corrected
    pixels -- matches OracleRun.expected_correction_summary for the
    driver's hash comparison."""
    import numpy as np

    def summarize(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            px = np.frombuffer(b"".join(pdf["px"].tolist()), dtype="<f4") \
                .reshape(len(pdf), tile * tile)
            finite = np.isfinite(px)
            yield pd.DataFrame({
                "image_id": pdf["image_id"], "band": pdf["band"],
                "method": pdf["method"],
                "n_valid": finite.sum(axis=1).astype("int64"),
                "sum_px": np.where(finite, px.astype(np.float64), 0.0).sum(axis=1),
            })

    partial = corrected.mapInPandas(
        summarize,
        schema="image_id string, band int, method string, n_valid long, sum_px double")
    return (partial.groupBy("image_id", "band", "method")
            .agg(F.sum("n_valid").alias("n_valid"),
                 F.sum("sum_px").alias("sum_px"))
            .select("image_id", "band", "method", "n_valid",
                    F.round(F.col("sum_px") / F.col("n_valid"), round_to)
                    .alias("mean_px")))
