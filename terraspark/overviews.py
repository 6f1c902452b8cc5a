"""Raster overview pyramid: iterative 2x downsampling (gdaladdo / COG
overviews analogue).

Cloud-optimized rasters ship overview levels (each 2x coarser) so
readers can serve zoomed-out views without scanning full resolution;
`gdaladdo -r average` builds them.  Distributed shape, per level:

* every tile downsamples ITSELF 2x (aligned 2x2 box nanmean -- NoData
  pixels are excluded like GDAL 'average' with nodata; blocks align to
  tile boundaries, so no halo is needed and the tiled result is
  bit-identical to downsampling the whole plane);
* ONE hash shuffle on the parent tile key (image, band, tx//2, ty//2)
  assembles up to 4 half-size children into each parent tile --
  shuffle volume is exactly the level's pixel bytes, which HALVE every
  level (the whole pyramid costs ~1/3 of the base in traffic);
* parent blocks are stored float32 (the on-disk dtype), and the next
  level consumes those bytes, so precision matches a real multi-pass
  overview build; per-level arithmetic is float64.

Missing children (image edges at odd tile counts) leave NaN quadrants,
matching GDAL's ungenerated-area semantics.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .config import TILE

OVERVIEW_SCHEMA = (
    "image_id string, band int, level int, tile_x int, tile_y int, "
    "n_valid long, mean_val double, px binary"
)


def _downsample2(plane64: np.ndarray) -> np.ndarray:
    h = plane64.shape[0] // 2
    blk = plane64.reshape(h, 2, h, 2).transpose(0, 2, 1, 3).reshape(h, h, 4)
    with np.errstate(all="ignore"):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return np.nanmean(blk, axis=2)


def overview_pyramid(tiles: DataFrame, levels: int = 2) -> DataFrame:
    """Build ``levels`` overview levels from the engine tile table.

    Input needs (image_id, band, tile_x, tile_y, px); returns one row
    per overview tile: (image_id, band, level, tile_x, tile_y, n_valid,
    mean_val, px), where px is the float32 block, n_valid counts finite
    pixels and mean_val is the float64 nanmean of the STORED float32
    block (what a reader of the overview actually sees).
    """
    def _assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        image_id, band, ptx, pty, level = key
        half = TILE // 2
        canvas = np.full((TILE, TILE), np.nan, dtype=np.float64)
        for r in pdf.itertuples():
            child = np.frombuffer(r.px, dtype="<f4") \
                .reshape(TILE, TILE).astype(np.float64)
            down = _downsample2(child)
            qy, qx = int(r.tile_y) % 2, int(r.tile_x) % 2
            canvas[qy * half:(qy + 1) * half,
                   qx * half:(qx + 1) * half] = down
        stored = canvas.astype("<f4")
        as64 = stored.astype(np.float64)
        valid = np.isfinite(as64)
        return pd.DataFrame({
            "image_id": [image_id], "band": [band], "level": [level],
            "tile_x": [int(ptx)], "tile_y": [int(pty)],
            "n_valid": [int(valid.sum())],
            "mean_val": [float(np.nanmean(as64)) if valid.any()
                         else float("nan")],
            "px": [stored.tobytes()],
        })

    cur = tiles.select("image_id", "band", "tile_x", "tile_y", "px")
    out = None
    for level in range(1, levels + 1):
        parents = (cur
                   .withColumn("_ptx", (F.col("tile_x") / 2).cast("int"))
                   .withColumn("_pty", (F.col("tile_y") / 2).cast("int"))
                   .withColumn("_lvl", F.lit(level))
                   .groupBy("image_id", "band", "_ptx", "_pty", "_lvl")
                   .applyInPandas(_assemble, OVERVIEW_SCHEMA)
                   # each level feeds BOTH the result union and the next
                   # level: materialize once instead of recomputing the
                   # whole pyramid prefix per branch
                   .localCheckpoint())
        out = parents if out is None else out.unionByName(parents)
        cur = parents.select("image_id", "band", "tile_x", "tile_y", "px")
    return out
