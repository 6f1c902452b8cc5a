"""Decode + tile fan-out: 1 image row -> bands * (w/TILE) * (h/TILE) tile rows.

This is the engine's scan operator (SURVEY.md S1-S5): the reference opens a
GDAL dataset and streams fixed blocks (/root/reference/util/raster_calc.py:219-254);
we decode each image ONCE inside a ``mapInPandas`` iterator (UDTF-shaped:
one input row fans out to many tile rows) and assign every tile an H3-like
cell key via batched vectorized encode (north rule: no per-row Python).

Output schema (the engine's central table):
    image_id, caption, fmt, band, tile_x, tile_y, lat, lon, cell, px(binary)

``px`` is the raw little-endian float32 TILE*TILE block -- zero-copy into
numpy downstream.  Lineage columns (caption, fmt) ride along; ``phash`` is
re-computed on decode and checked against the stored column (integrity,
mirroring the reference's metadata-preservation behavior,
/root/reference/processing_alg/topocorrection/TopoCorrectionPostProcessor.py:45-56).
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cells, codecs
from .config import CELL_DEG, CELL_RES, TILE

TILE_SCHEMA = (
    "image_id string, caption string, fmt string, band int, "
    "tile_x int, tile_y int, lat double, lon double, cell long, "
    "px binary, phash_ok boolean"
)


_TILE_COLS = ["image_id", "caption", "fmt", "band", "tile_x", "tile_y",
              "lat", "lon", "cell", "px", "phash_ok"]


def _tile_one(row, tile: int, pixel_deg: float, bands: int) -> pd.DataFrame:
    """All tile rows of one image -- a single reshape/transpose + one
    buffer copy; no per-tile Python loop (the per-(band,ty,tx) loop this
    replaces was the measured serial fraction of the decode stage)."""
    px = codecs.decode(row.bytes, row.fmt, bands, row.h, row.w)
    ok = codecs.dhash64(px) == row.phash
    ntx, nty = row.w // tile, row.h // tile
    n = bands * nty * ntx
    # (bands, h, w) -> (bands, nty, ntx, tile, tile) C-contiguous: every
    # tile block becomes one contiguous 16 KiB span of a single buffer
    blocks = np.ascontiguousarray(
        px.reshape(bands, nty, tile, ntx, tile).transpose(0, 1, 3, 2, 4),
        dtype="<f4")
    buf = blocks.tobytes()
    sz = tile * tile * 4
    ty_idx = np.tile(np.repeat(np.arange(nty), ntx), bands)
    tx_idx = np.tile(np.arange(ntx), bands * nty)
    # lat0/lon0: image's north-west corner (rasters are row-0-north)
    return pd.DataFrame({
        "image_id": row.image_id, "caption": row.caption, "fmt": row.fmt,
        "band": np.repeat(np.arange(bands, dtype="int32"), nty * ntx),
        "tile_x": tx_idx.astype("int32"),
        "tile_y": ty_idx.astype("int32"),
        "lat": row.lat0 - (ty_idx + 0.5) * tile * pixel_deg,
        "lon": row.lon0 + (tx_idx + 0.5) * tile * pixel_deg,
        "px": [buf[i * sz:(i + 1) * sz] for i in range(n)],
        "phash_ok": ok,
    })


def _tile_batches(batches: Iterator[pd.DataFrame], tile: int, cell_res: int,
                  bands: int) -> Iterator[pd.DataFrame]:
    cell_deg = 1.0 / (1 << cell_res)
    pixel_deg = cell_deg / tile
    for pdf in batches:
        frames = [_tile_one(row, tile, pixel_deg, bands)
                  for row in pdf.itertuples(index=False)]
        if frames:
            res = pd.concat(frames, ignore_index=True)
            # batched vectorized cell encode (north rule)
            res["cell"] = cells.encode(res["lat"].to_numpy(),
                                       res["lon"].to_numpy(), cell_res)
        else:
            res = pd.DataFrame({c: [] for c in _TILE_COLS})
            res["cell"] = res["cell"].astype("int64")
        yield res[_TILE_COLS]


def tile_images(images: DataFrame, scenes: DataFrame, tile: int = TILE,
                cell_res: int = CELL_RES, bands: int = 4,
                input_partitions: int | None = None) -> DataFrame:
    """images (input_hint schema) x scenes (georeference dim) -> tile rows.

    The scenes join is a broadcast hash join (tiny dimension table); the
    heavy decode work happens after it in one map stage (decode -> tile ->
    cell-assign).  Images are explicitly repartitioned first: parquet scans
    of fat binary rows yield few input splits, which would serialize the
    decode across a handful of tasks (at cluster scale the scan naturally
    has many splits; locally this keeps all cores busy).
    """
    if images.isStreaming:
        pass  # streaming plans cannot inspect .rdd; the micro-batch source
        #       already splits by file (maxFilesPerTrigger governs width)
    else:
        if input_partitions is None:
            input_partitions = int(
                images.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        # only shuffle when the scan cannot keep the cores busy (tiny local
        # inputs): a many-file production-scale scan already has >= cores
        # natural splits, and repartitioning would shuffle the raw image
        # bytes -- the fattest column in the system -- for nothing
        cores = images.sparkSession.sparkContext.defaultParallelism
        if images.rdd.getNumPartitions() < min(cores, input_partitions):
            images = images.repartition(input_partitions)
    src = images.join(F.broadcast(scenes), "image_id", "inner")
    return src.mapInPandas(
        lambda it: _tile_batches(it, tile, cell_res, bands),
        schema=TILE_SCHEMA)


def tiles_as_numpy(pdf: pd.DataFrame, col: str = "px",
                   tile: int = TILE) -> np.ndarray:
    """Stack a pandas column of tile blobs into (n, tile*tile) float32.

    Returns a read-only view over the joined buffer (no copy): every
    consumer treats inputs as immutable (kernels allocate their own output
    via astype), so the copy would only burn memory bandwidth."""
    if not len(pdf):
        return np.empty((0, tile * tile), dtype=np.float32)
    return np.frombuffer(b"".join(pdf[col].tolist()),
                         dtype="<f4").reshape(len(pdf), tile * tile)
