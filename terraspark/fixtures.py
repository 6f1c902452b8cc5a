"""Deterministic synthetic fixtures (FIXTURES.md): images, DEM tiles, AOI.

Layout
------
4 "hill" regions (one DEM each, dem_3 is a flat plain -- the slope==0 /
aspect ZERO_FLAT edge case).  Each region is a grid of TILE x TILE cells
whose grid coincides with the terraspark cell index at CELL_RES (pixel size
= CELL_DEG / TILE), so tile->cell assignment is exactly checkable.

Image i sits over hill k = i % 4 at slot s = i // 4.  DELIBERATE SKEW: every
image of hill 0 uses slot (0, 0), so 8+ images fully overlap and each of
those 16 cells fans in 8x more tile rows than any other cell (FIXTURES.md
"one anchor cell reused by 8 images").

Pixel model per FIXTURES.md: DN = clip(gain_b * reflectance * cos_i +
offset_b + noise, 0, dn_max); ~1% zeros (below ignore threshold) and, for
raw_f32 images, ~1% NaN NoData.  cos_i comes from the DEM so corrections
have real signal to remove.

Formats: raw_f32 (i%2==0), png 16-bit (i%4==1), jpeg-stub lossy (i%4==3).

Everything is a plain pandas DataFrame; helpers write parquet and create
Spark DataFrames.  Seeded by config.SEED -- byte-identical across runs.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

from . import cells, codecs
from .config import (BANDS, CELL_DEG, CELL_RES, DEFAULT_PARAMS, IMG_H, IMG_W,
                     SEED, TILE, CorrectionParams)
from .kernels import luminance, pad_extrapolate, aspect_radians, slope_radians

BASE_LAT = 40.0
BASE_LON = -105.0
HILLS = 4
REGION_SEP_DEG = 0.5          # lon separation between hill regions

GAINS = np.array([800.0, 650.0, 500.0, 350.0])
OFFSETS = np.array([40.0, 30.0, 20.0, 10.0])


@dataclass(frozen=True)
class Layout:
    n_images: int
    tiles_x: int = IMG_W // TILE      # image tiles per axis (4)
    tiles_y: int = IMG_H // TILE

    @property
    def slots(self) -> int:
        return max(1, math.ceil(self.n_images / HILLS))

    @property
    def slot_cols(self) -> int:
        return 2 if self.slots <= 8 else 8

    @property
    def slot_rows(self) -> int:
        return math.ceil(self.slots / self.slot_cols)

    # region size in cells: 1-cell margin, slots spaced 5 cells in x
    # (no overlap) and 3 cells in y (1-cell vertical overlap between
    # vertically adjacent images -> shared cells, join fan-in)
    @property
    def region_w(self) -> int:
        return 2 + 5 * (self.slot_cols - 1) + self.tiles_x

    @property
    def region_h(self) -> int:
        return 2 + 3 * (self.slot_rows - 1) + self.tiles_y

    def slot_of(self, i: int) -> tuple[int, int]:
        if i % HILLS == 0:
            return (0, 0)          # deliberate skew: hill-0 images all overlap
        s = i // HILLS
        return (s % self.slot_cols, s // self.slot_cols)

    def anchor_cell(self, i: int) -> tuple[int, int]:
        """(cell_x, cell_y) of image i's top-left tile inside its region."""
        gx, gy = self.slot_of(i)
        return (1 + 5 * gx, 1 + 3 * gy)

    def region_origin(self, hill: int) -> tuple[float, float]:
        """(lat, lon) of the region's NORTH-west corner, cell-aligned.

        Raster convention throughout the engine: array row 0 is the north
        edge; row/tile_y indices increase southward (standard geo raster).
        """
        lat = round(BASE_LAT / CELL_DEG) * CELL_DEG
        lon = round((BASE_LON + REGION_SEP_DEG * hill) / CELL_DEG) * CELL_DEG
        return lat, lon

    def image_origin(self, i: int) -> tuple[float, float]:
        """North-west corner (lat, lon) of image i."""
        hill = i % HILLS
        cx, cy = self.anchor_cell(i)
        lat0, lon0 = self.region_origin(hill)
        return lat0 - cy * CELL_DEG, lon0 + cx * CELL_DEG


# ---------------------------------------------------------------- DEM
def dem_grid(hill: int, layout: Layout) -> np.ndarray:
    """Full-region DEM (region_h*TILE, region_w*TILE) float32.

    Gaussian hill (H=500 m) + seeded ripple, clipped to a perfectly flat
    plateau at 520 m (slope==0 / aspect ZERO_FLAT edge case,
    /root/reference/processing_alg/execution_context.py:237).  Hill 3 is a
    near-flat plain (tiny ripple, NOT perfectly flat: a perfectly flat
    scene makes the luminance regressions rank-deficient, which the
    reference would hit too -- we keep fits well-conditioned and exercise
    ZERO_FLAT via the plateaus instead).
    """
    h = layout.region_h * TILE
    w = layout.region_w * TILE
    if hill == 3:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        return (100.0 + 2.0 * np.sin(xx / 97.0) * np.cos(yy / 71.0)
                ).astype(np.float32)
    rng = np.random.default_rng(SEED + 1000 + hill)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cy, cx = h / 2.0, w / 2.0
    sigma = 0.25 * min(h, w)
    hillz = 500.0 * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2)))
    phase = rng.uniform(0, 2 * np.pi, size=4)
    ripple = (
        8.0 * np.sin(xx / (17.0 + hill) + phase[0]) * np.cos(yy / (23.0 + hill) + phase[1])
        + 4.0 * np.sin((xx + yy) / (41.0 + hill) + phase[2])
    )
    return np.minimum(100.0 + hillz + ripple, 520.0).astype(np.float32)


def dem_features(z: np.ndarray, params: CorrectionParams):
    """Full-grid slope/aspect/luminance (the numpy-oracle derivation)."""
    zpad = pad_extrapolate(z.astype(np.float64))
    slope = slope_radians(zpad, params.pixel_size_m)
    aspect = aspect_radians(zpad, params.pixel_size_m)
    lum = luminance(slope, aspect, params)
    return slope, aspect, lum


# -------------------------------------------------------------- images
# dn_max per format: integer formats stay strictly below the type's
# default-NDV sentinel (e.g. Byte NDV=255 -> dn_max 254) so real pixels
# never alias NoData
_DN_MAX = {"raw_f32": 1000.0, "png": 10000.0, "jpeg": 255.0,
           "raw_u16": 10000.0, "raw_u8": 254.0, "raw_i16": 10000.0,
           "raw_u32": 100000.0, "raw_i32": 100000.0, "raw_f64": 1000.0}
_INT_FMTS = ("png", "raw_u16", "raw_u8", "raw_i16", "raw_u32", "raw_i32")
_NDV_FMTS = ("raw_f32", "raw_u16", "raw_u8", "raw_i16",
             "raw_u32", "raw_i32", "raw_f64")


def image_pixels(i: int, layout: Layout, lum_grid: np.ndarray,
                 params: CorrectionParams, fmt: str | None = None) -> np.ndarray:
    """Pristine float pixels (BANDS, IMG_H, IMG_W) for image i."""
    rng = np.random.default_rng(SEED + 10_000 + i)
    cx, cy = layout.anchor_cell(i)
    y0, x0 = cy * TILE, cx * TILE
    cos_i = lum_grid[y0 : y0 + IMG_H, x0 : x0 + IMG_W].astype(np.float64)

    # smooth per-image reflectance field (sum of random low-freq cosines)
    yy, xx = np.mgrid[0:IMG_H, 0:IMG_W].astype(np.float64)
    refl = 0.5 + 0.1 * np.sin(xx / 37.0 + rng.uniform(0, 6)) \
        + 0.1 * np.cos(yy / 53.0 + rng.uniform(0, 6)) \
        + 0.05 * np.sin((xx + 2 * yy) / 91.0 + rng.uniform(0, 6))
    refl = np.clip(refl, 0.05, 1.0)

    fmt = fmt or image_fmt(i)
    dn_max = _DN_MAX[fmt]
    scale = dn_max / 1000.0

    px = np.empty((BANDS, IMG_H, IMG_W), dtype=np.float32)
    for b in range(BANDS):
        noise = rng.normal(0.0, 2.0, size=(IMG_H, IMG_W))
        dn = np.clip(scale * (GAINS[b] * refl * cos_i + OFFSETS[b] + noise), 0, dn_max)
        if fmt in _INT_FMTS:
            dn = np.rint(dn)
        px[b] = dn.astype(np.float32)

    # ~1% zeros (below ignore threshold) and ~1% NaN NoData (formats with
    # an NDV sentinel: raw float + the typed integer lattice)
    zeros = rng.random((IMG_H, IMG_W)) < 0.01
    px[:, zeros] = 0.0
    if fmt in _NDV_FMTS:
        ndv = rng.random((IMG_H, IMG_W)) < 0.01
        px[:, ndv] = np.nan
    return px


def image_fmt(i: int) -> str:
    if i % 2 == 0:
        return "raw_f32"
    return "png" if i % 4 == 1 else "jpeg"


def typed_fmt(i: int) -> str:
    """Format cycle for the TYPED fixture set: the FULL GDAL lattice
    (SURVEY section 1.2) -- UInt16/Byte/Int16/UInt32/Int32/Float64, each
    with its DefaultNDVLookup NoData sentinel (what real imagery, e.g.
    uint16 + NDV, looks like)."""
    return ("raw_u16", "raw_u8", "raw_i16",
            "raw_u32", "raw_i32", "raw_f64")[i % 6]


def caption_of(i: int) -> str:
    return f"synthetic scene {i} over hill {i % HILLS}"


# ----------------------------------------------------------- table build
def build_tables(n_images: int, params: CorrectionParams = DEFAULT_PARAMS,
                 fmt_of=image_fmt):
    """Return (images_df, scenes_df, dem_df, aoi_df, dem_grids) as pandas.

    images: exact input_hint schema (image_id, bytes, w, h, fmt, caption,
            phash).
    scenes: geo-reference dimension table (image_id, lat0, lon0, hill) --
            the georeferencing sidecar (the reference carries geotransforms
            in GeoTIFF headers, /root/reference/util/raster_calc.py:164-173).
    dem:    (dem_id, cell, tile_x, tile_y, lat, lon, elev) one row per cell.
    aoi:    (aoi_id, name, polygon WKT, cells) classification polygons.
    """
    layout = Layout(n_images)
    grids = {k: dem_grid(k, layout) for k in range(HILLS)}
    feats = {k: dem_features(grids[k], params) for k in range(HILLS)}

    img_rows, scene_rows = [], []
    for i in range(n_images):
        hill = i % HILLS
        fmt = fmt_of(i)
        px = image_pixels(i, layout, feats[hill][2], params, fmt=fmt)
        data = codecs.encode(px, fmt)
        decoded = codecs.decode(data, fmt, BANDS, IMG_H, IMG_W)
        lat0, lon0 = layout.image_origin(i)
        img_rows.append({
            "image_id": f"img_{i:06d}", "bytes": data, "w": IMG_W, "h": IMG_H,
            "fmt": fmt, "caption": caption_of(i),
            "phash": codecs.dhash64(decoded),
        })
        scene_rows.append({"image_id": f"img_{i:06d}", "lat0": lat0,
                           "lon0": lon0, "hill": hill})

    dem_rows = []
    for k in range(HILLS):
        lat0, lon0 = layout.region_origin(k)
        z = grids[k]
        for ty in range(layout.region_h):
            for tx in range(layout.region_w):
                clat = lat0 - (ty + 0.5) * CELL_DEG   # row 0 = north
                clon = lon0 + (tx + 0.5) * CELL_DEG
                block = z[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE]
                dem_rows.append({
                    "dem_id": f"dem_{k}",
                    "cell": int(cells.encode(clat, clon, CELL_RES)),
                    "tile_x": tx, "tile_y": ty, "lat": clat, "lon": clon,
                    "elev": np.ascontiguousarray(block, dtype="<f4").tobytes(),
                })

    aoi_rows = []
    zones = [
        (1, 0, 1.0),    # zone_1: all of hill 0 region (covers the hot cells)
        (2, 1, 0.5),    # zone_2: west half of hill 1 region
        (3, 2, 1.0),    # zone_3: all of hill 2 region; hill 3 uncovered
    ]
    for aoi_id, hill, frac in zones:
        lat0, lon0 = layout.region_origin(hill)       # NW corner
        lat1 = lat0 - layout.region_h * CELL_DEG      # south edge
        lon1 = lon0 + layout.region_w * CELL_DEG * frac
        wkt = (f"POLYGON(({lon0} {lat1}, {lon1} {lat1}, {lon1} {lat0}, "
               f"{lon0} {lat0}, {lon0} {lat1}))")
        cover = cells.cover_wkt(wkt, CELL_RES)
        aoi_rows.append({"aoi_id": aoi_id, "name": f"zone_{aoi_id}",
                         "polygon": wkt,
                         "cells": [int(c) for c in cover]})

    return (pd.DataFrame(img_rows), pd.DataFrame(scene_rows),
            pd.DataFrame(dem_rows), pd.DataFrame(aoi_rows), grids)


def to_spark(spark, pdf: pd.DataFrame, schema: str):
    return spark.createDataFrame(pdf, schema=schema)


IMAGES_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                 "caption string, phash long")
SCENES_SCHEMA = "image_id string, lat0 double, lon0 double, hill int"
DEM_SCHEMA = ("dem_id string, cell long, tile_x int, tile_y int, "
              "lat double, lon double, elev binary")
AOI_SCHEMA = "aoi_id int, name string, polygon string, cells array<long>"


def spark_tables(spark, n_images: int, params: CorrectionParams = DEFAULT_PARAMS):
    images, scenes, dem, aoi, _ = build_tables(n_images, params)
    return (
        to_spark(spark, images, IMAGES_SCHEMA),
        to_spark(spark, scenes, SCENES_SCHEMA),
        to_spark(spark, dem, DEM_SCHEMA),
        to_spark(spark, aoi, AOI_SCHEMA),
    )
