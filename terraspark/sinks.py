"""Sink-side operators: band merge (S7), partitioned tile sink (S6),
per-cell statistics (raster -> vector).

S7 band merge: the reference stacks per-band GeoTIFFs into one multiband
raster via gdal:merge SEPARATE=True and casts to the input's type
(/root/reference/processing_alg/execution_context.py:296-323,
TopoCorrectionAlgorithm.py:56-57).  In the engine bands are rows, so the
merge is a groupBy collecting the band blocks into an ordered array -- one
shuffle keyed by (image_id, method, tile_x, tile_y), uniform keys.

S6 sink: corrected tiles written as parquet partitioned by a cell bucket
(the Iceberg-table analogue available in this container; swap
``.writeTo(...iceberg...)`` when a catalog is present).

Per-cell stats: the raster->vector conversion from the north star -- each
cell becomes a feature row with aggregate statistics of the corrected
pixels that fall in it.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import TILE


def merge_bands(corrected: DataFrame) -> DataFrame:
    """(image, method, tile) rows with per-band px -> one row with
    ``bands array<binary>`` ordered by band index (S7)."""
    return (corrected
            .groupBy("image_id", "caption", "method", "tile_x", "tile_y",
                     "cell")
            .agg(F.array_sort(F.collect_list(F.struct("band", "px")))
                 .alias("_b"))
            .select("image_id", "caption", "method", "tile_x", "tile_y",
                    "cell",
                    F.transform("_b", lambda s: s.px).alias("bands"),
                    F.size("_b").alias("n_bands")))


TYPED_SCHEMA = ("image_id string, band int, tile_x int, tile_y int, "
                "cell long, method string, out_dtype string, ndv double, "
                "n_ndv long, typed_px binary")


def cast_to_input_type(corrected: DataFrame, image_fmts: DataFrame,
                       tile: int = TILE) -> DataFrame:
    """Final-output cast: float32 corrected tiles -> the INPUT image's
    dtype, NaN -> the type's default NDV (the reference's merge-time cast,
    TopoCorrectionAlgorithm.py:56-57 + gdal_utils.py:102-110 +
    raster_calc.py:175-180; engine contract in terraspark.dtypes).

    ``image_fmts``: (image_id, fmt) dimension rows (broadcast)."""
    from . import dtypes

    src = corrected.join(
        F.broadcast(image_fmts.select("image_id", "fmt")), "image_id")

    def cast_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = tile * tile
        for pdf in batches:
            if not len(pdf):
                continue
            px = np.frombuffer(b"".join(pdf["px"].tolist()),
                               dtype="<f4").reshape(len(pdf), n)
            out_px = np.empty(len(pdf), dtype=object)
            out_t = np.empty(len(pdf), dtype=object)
            ndv = np.empty(len(pdf), dtype=np.float64)
            n_ndv = np.isnan(px).sum(axis=1).astype("int64")
            for gdal_t, idx in pdf.groupby(
                    pdf["fmt"].map(dtypes.FMT_DTYPE), sort=False).indices.items():
                typed = dtypes.cast_to_dtype(px[idx], gdal_t)
                for j, k in enumerate(idx):
                    out_px[k] = typed[j].tobytes()
                    out_t[k] = gdal_t
                ndv[idx] = dtypes.DEFAULT_NDV[gdal_t]
            yield pd.DataFrame({
                "image_id": pdf["image_id"], "band": pdf["band"],
                "tile_x": pdf["tile_x"], "tile_y": pdf["tile_y"],
                "cell": pdf["cell"], "method": pdf["method"],
                "out_dtype": out_t, "ndv": ndv, "n_ndv": n_ndv,
                "typed_px": out_px,
            })

    return src.mapInPandas(cast_batches, schema=TYPED_SCHEMA)


def write_corrected(corrected: DataFrame, path: str, buckets: int = 64,
                    mode: str = "overwrite") -> None:
    """S6: partitioned, pruned-scannable sink for corrected tiles."""
    (corrected
     .withColumn("cell_bucket",
                 F.pmod(F.xxhash64("cell"), F.lit(buckets)).cast("int"))
     .write.partitionBy("cell_bucket", "method").mode(mode).parquet(path))


GEOTIFF_SCHEMA = ("image_id string, method string, caption string, "
                  "w int, h int, tiff binary")


def reassemble_geotiff(corrected: DataFrame, scenes: DataFrame,
                       bands: int = 4, tile: int = TILE,
                       pixel_deg: float | None = None) -> DataFrame:
    """Tiles -> whole multiband baseline-GeoTIFF per (image, method).

    The inverse of the tiling scan: groups a corrected image's band tiles,
    reassembles the (bands, h, w) array, and encodes it with geo tags
    (ModelPixelScale/ModelTiepoint from the scenes dimension table) -- the
    engine's equivalent of the reference's merge_bands + GTiff write
    (/root/reference/processing_alg/execution_context.py:296-323,
    util/raster_calc.py:141-192)."""
    from .config import PIXEL_DEG
    from . import tiff as tiff_codec

    pixel_deg = pixel_deg or PIXEL_DEG
    src = corrected.join(
        F.broadcast(scenes.select("image_id", "lat0", "lon0")), "image_id")

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        image_id, method = key
        ntx = int(pdf["tile_x"].max()) + 1
        nty = int(pdf["tile_y"].max()) + 1
        w, h = ntx * tile, nty * tile
        arr = np.full((bands, h, w), np.nan, dtype=np.float32)
        for r in pdf.itertuples(index=False):
            block = np.frombuffer(r.px, dtype="<f4").reshape(tile, tile)
            arr[r.band, r.tile_y * tile:(r.tile_y + 1) * tile,
                r.tile_x * tile:(r.tile_x + 1) * tile] = block
        data = tiff_codec.encode(
            arr, pixel_scale=(pixel_deg, pixel_deg),
            tiepoint=(float(pdf["lon0"].iat[0]), float(pdf["lat0"].iat[0])))
        return pd.DataFrame([{
            "image_id": image_id, "method": method,
            "caption": pdf["caption"].iat[0], "w": w, "h": h, "tiff": data,
        }])

    return src.groupBy("image_id", "method").applyInPandas(
        assemble, schema=GEOTIFF_SCHEMA)


CELL_STATS_PARTIAL = ("cell long, method string, band int, n long, "
                      "s double, ss double, vmin double, vmax double")


def cell_partials(tiles: DataFrame, tile: int = TILE) -> DataFrame:
    """Tile rows -> per (cell, method, band) FULL-PRECISION mergeable
    partials (n, s, ss, min, max): the shared reduction under cell_stats,
    rollup.rollup_stats and vectorize.polygonize -- tile-level partial
    sums map-side, one tiny groupBy, never an exploded pixel table."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = tile * tile
        for pdf in batches:
            if not len(pdf):
                continue
            px = np.frombuffer(b"".join(pdf["px"].tolist()),
                               dtype="<f4").reshape(len(pdf), n) \
                .astype(np.float64)
            fin = np.isfinite(px)
            cnt = fin.sum(axis=1)
            z = np.where(fin, px, 0.0)
            yield pd.DataFrame({
                "cell": pdf["cell"], "method": pdf["method"],
                "band": pdf["band"], "n": cnt.astype("int64"),
                "s": z.sum(axis=1), "ss": (z * z).sum(axis=1),
                "vmin": np.where(fin, px, np.inf).min(axis=1),
                "vmax": np.where(fin, px, -np.inf).max(axis=1),
            })

    p = tiles.mapInPandas(partials, schema=CELL_STATS_PARTIAL)
    return p.groupBy("cell", "method", "band").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s"), F.sum("ss").alias("ss"),
        F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax"))


def cell_stats(corrected: DataFrame, tile: int = TILE,
               round_to: int = 4) -> DataFrame:
    """Per-cell aggregate statistics of corrected pixels (raster->vector):
    (cell, method, band) -> n, mean, std_pop, min, max."""
    g = cell_partials(corrected, tile)
    mean = F.col("s") / F.col("n")
    var = F.col("ss") / F.col("n") - mean * mean
    return g.select(
        "cell", "method", "band", "n",
        F.round(mean, round_to).alias("mean"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), round_to).alias("std"),
        F.round("vmin", round_to).alias("vmin"),
        F.round("vmax", round_to).alias("vmax"))
