"""Generic tile-boundary-correct image convolution via halo exchange.

The raster-engine counterpart of the DEM slope/aspect derivation
(terraspark.dem): a 3x3 kernel needs a 1-pixel halo, so each image tile
emits its edge rows/cols/corners to its grid neighbors (tile_x/tile_y
space -- no cell keys needed inside one image), one shuffle gathers the
(image_id, band, tile) groups, and a sorted-partition assembler builds
the (TILE+2)^2 padded block and evaluates the kernel.

Border semantics are EXACTLY gdaldem COMPUTE_EDGES linear extrapolation:
the padded-block assembly is terraspark.dem.assemble_padded -- the same
tested function the DEM derivation uses (halo == full-grid proven in
test_units for the DEM case; test_convolve re-proves it for image
planes), so a tile-parallel convolution is bit-identical to convolving
the whole plane at once.

Scale: shuffle volume is ~1.03x the image bytes (center tile + 4 thin
strips + 4 corner pixels); the grouping key (image_id, band, tile) is
uniform, no skew; one Python call per partition (contiguous sorted
groups), all f64 math inside.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .config import TILE
from .dem import assemble_padded

# classic 3x3 binomial (Gaussian) blur; any 3x3 f64 kernel works
KERNEL_GAUSS3 = np.array([[1.0, 2.0, 1.0],
                          [2.0, 4.0, 2.0],
                          [1.0, 2.0, 1.0]]) / 16.0

# 3x3 neighborhood mean (TPI base kernel)
KERNEL_MEAN3 = np.ones((3, 3)) / 9.0

_HALO_SCHEMA = ("image_id string, band int, ttx int, tty int, role string, "
                "data binary")
_OUT_SCHEMA = ("image_id string, band int, tile_x int, tile_y int, "
               "conv binary, n_nan int, conv_sum double")

# sender-relative emits: (role at the TARGET, d_tile_x, d_tile_y).
# raster row 0 is the tile's top; the target's N halo row is the bottom
# row of the tile above it (tty - 1), so a sender provides it to tty + 1.
_EMITS = (
    ("C", 0, 0), ("N", 0, 1), ("S", 0, -1), ("W", 1, 0), ("E", -1, 0),
    ("NW", 1, 1), ("NE", -1, 1), ("SW", 1, -1), ("SE", -1, -1),
)


def _payload(z: np.ndarray, role: str) -> np.ndarray:
    if role == "C":
        return z
    if role == "N":
        return z[-1]
    if role == "S":
        return z[0]
    if role == "W":
        return z[:, -1]
    if role == "E":
        return z[:, 0]
    if role == "NW":
        return z[-1:, -1]
    if role == "NE":
        return z[-1:, :1][0]
    if role == "SW":
        return z[:1, -1]
    return z[:1, :1][0]          # SE


def conv3(zp: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """3x3 convolution of a 1-px-padded f64 block, deterministic term
    order (row-major over the kernel) -- shared by the engine assembler
    and the numpy plane model so sums are bit-identical."""
    t = zp.shape[0] - 2
    out = np.zeros((t, zp.shape[1] - 2), dtype=np.float64)
    for i in range(3):
        for j in range(3):
            out += kernel[i, j] * zp[i:i + t, j:j + zp.shape[1] - 2]
    return out


def _batch_payload(a: np.ndarray, role: str) -> np.ndarray:
    """Strip slice of the whole stacked (n, tile, tile) batch at once --
    the vectorized form of ``_payload`` (one slice per role per batch
    instead of one per tile row)."""
    n = len(a)
    if role == "C":
        return a.reshape(n, -1)
    if role == "N":
        return a[:, -1, :]
    if role == "S":
        return a[:, 0, :]
    if role == "W":
        return a[:, :, -1]
    if role == "E":
        return a[:, :, 0]
    if role == "NW":
        return a[:, -1, -1].reshape(n, 1)
    if role == "NE":
        return a[:, -1, 0].reshape(n, 1)
    if role == "SW":
        return a[:, 0, -1].reshape(n, 1)
    return a[:, 0, 0].reshape(n, 1)          # SE


def _emit_halo(batches: Iterator[pd.DataFrame],
               tile: int) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        n = len(pdf)
        a = np.frombuffer(b"".join(pdf["px"].tolist()),
                          dtype="<f4").reshape(n, tile, tile)
        ids = pdf["image_id"].to_numpy()
        bands = pdf["band"].to_numpy()
        tx = pdf["tile_x"].to_numpy()
        ty = pdf["tile_y"].to_numpy()
        cols: dict[str, list] = {k: [] for k in (
            "image_id", "band", "ttx", "tty", "role", "data")}
        for role, dx, dy in _EMITS:
            p = np.ascontiguousarray(_batch_payload(a, role), dtype="<f4")
            cols["image_id"].append(ids)
            cols["band"].append(bands)
            cols["ttx"].append(tx + dx)
            cols["tty"].append(ty + dy)
            cols["role"].append(np.full(n, role, dtype=object))
            cols["data"].append([r.tobytes() for r in p])
        yield pd.DataFrame({
            "image_id": np.concatenate(cols["image_id"]),
            "band": np.concatenate(cols["band"]),
            "ttx": np.concatenate(cols["ttx"]),
            "tty": np.concatenate(cols["tty"]),
            "role": np.concatenate(cols["role"]),
            "data": [b for role_block in cols["data"]
                     for b in role_block]})


def convolve_tiles(tiles: DataFrame, kernel: np.ndarray | None = None,
                   tile: int = TILE,
                   partitions: int | None = None) -> DataFrame:
    """tiles(image_id, band, tile_x, tile_y, px) -> filtered tiles
    (conv binary f32) + per-tile f64 audit columns (n_nan, conv_sum).

    One halo shuffle keyed (image_id, band, ttx, tty), sorted within
    partitions so each group is contiguous (the dem.derive_features
    pattern)."""
    k = KERNEL_GAUSS3 if kernel is None else np.asarray(kernel, np.float64)
    if k.shape != (3, 3):
        raise ValueError(f"3x3 kernel required, got {k.shape}")
    return _apply_padded(tiles, lambda zp: conv3(zp, k), tile, partitions)


# ------------------------------------------------------------- morphology
def morph3(zp: np.ndarray, op: str) -> np.ndarray:
    """3x3 dilate (max) / erode (min) of a 1-px-padded f64 block.
    NaN propagates through the structuring element, mirroring conv3."""
    t, w = zp.shape[0] - 2, zp.shape[1] - 2
    f = np.maximum if op == "dilate" else np.minimum
    out = zp[0:t, 0:w].copy()
    for i in range(3):
        for j in range(3):
            if i == 0 and j == 0:
                continue
            out = f(out, zp[i:i + t, j:j + w])
    return out


def _apply_padded(tiles: DataFrame, fn, tile: int,
                  partitions: int | None) -> DataFrame:
    """Shared halo-exchange driver: fn(zp f64 padded) -> f64 block."""
    spark = tiles.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = tiles.select("image_id", "band", "tile_x", "tile_y", "px")
    halo = base.mapInPandas(lambda it: _emit_halo(it, tile),
                            schema=_HALO_SCHEMA)
    shuffled = halo.repartition(partitions, "image_id", "band", "ttx") \
        .sortWithinPartitions("image_id", "band", "ttx", "tty")
    return shuffled.mapInPandas(_assembler_fn(tile, fn), schema=_OUT_SCHEMA)


def _assembler_fn(tile: int, fn):
    cols = ("image_id", "band", "tile_x", "tile_y", "conv", "n_nan",
            "conv_sum")

    def one(key, g: pd.DataFrame, out: dict):
        roles = g["role"].to_numpy()
        cidx = np.where(roles == "C")[0]
        if not len(cidx):
            return
        data = g["data"].to_numpy()
        z = np.frombuffer(data[cidx[0]], dtype="<f4") \
            .reshape(tile, tile).astype(np.float64)
        strips = {roles[i]: np.frombuffer(data[i], dtype="<f4")
                  .astype(np.float64)
                  for i in range(len(g)) if roles[i] != "C"}
        res = fn(assemble_padded(z, strips, tile))
        out["image_id"].append(key[0])
        out["band"].append(int(key[1]))
        out["tile_x"].append(int(key[2]))
        out["tile_y"].append(int(key[3]))
        out["conv"].append(np.ascontiguousarray(res, dtype="<f4").tobytes())
        out["n_nan"].append(int(np.isnan(res).sum()))
        out["conv_sum"].append(float(np.nansum(res)))

    def run(batches):
        leftover = None
        keys = ["image_id", "band", "ttx", "tty"]
        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last = tuple(pdf[k].iat[-1] for k in keys)
            tail = np.logical_and.reduce(
                [pdf[k] == v for k, v in zip(keys, last)])
            leftover = pdf[tail]
            head = pdf[~tail]
            if not len(head):
                continue
            out = {k: [] for k in cols}
            for key, g in head.groupby(keys, sort=False):
                one(key, g, out)
            yield pd.DataFrame(out)
        if leftover is not None and len(leftover):
            out = {k: [] for k in cols}
            for key, g in leftover.groupby(keys, sort=False):
                one(key, g, out)
            yield pd.DataFrame(out)

    return run


def tpi3(zp: np.ndarray) -> np.ndarray:
    """Topographic position index of a 1-px-padded f64 block: center
    elevation minus its 3x3 neighborhood mean (Weiss 2001 TPI at the
    smallest scale).  Positive = locally high (ridge/knoll), negative =
    locally low (valley/channel), ~0 = flat or constant slope.  Shares
    conv3's deterministic term order, so tile-halo output is bit-equal
    to the full-plane computation."""
    return zp[1:-1, 1:-1] - conv3(zp, KERNEL_MEAN3)


def tpi_tiles(tiles: DataFrame, tile: int = TILE,
              partitions: int | None = None) -> DataFrame:
    """Halo-correct TPI over tiles(image_id, band, tile_x, tile_y, px)
    -- feed DEM elevation tiles as px to landform-classify terrain."""
    return _apply_padded(tiles, tpi3, tile, partitions)


def contour_crossings(zp: np.ndarray, levels: tuple[float, ...]) -> np.ndarray:
    """Per-pixel iso-line edge-crossing counts of a 1-px-padded f64
    block, one (t, w) plane per level, returned VERTICALLY STACKED
    (len(levels)*t, w) so a multi-level contour scan costs ONE halo
    exchange (the assembler ships opaque bytes; the consumer unstacks).

    Marching-squares edge rule with unambiguous ownership: every pixel
    owns its RIGHT and DOWN edge; the edge crosses level L when
    (z > L) differs across it.  Right/down neighbors of the tile's last
    column/row come from the halo (the true grid neighbor in the
    interior, the gdaldem extrapolation pad at the raster border), so
    per-tile counts sum EXACTLY to the full-grid count -- total contour
    length in edge units, an integer invariant."""
    t, w = zp.shape[0] - 2, zp.shape[1] - 2
    c = zp[1:t + 1, 1:w + 1]
    right = zp[1:t + 1, 2:w + 2]
    down = zp[2:t + 2, 1:w + 1]
    planes = []
    for lv in levels:
        a = c > lv
        planes.append((a != (right > lv)).astype(np.float64)
                      + (a != (down > lv)).astype(np.float64))
    return np.concatenate(planes, axis=0)


def contour_tiles(tiles: DataFrame, levels: tuple[float, ...],
                  tile: int = TILE,
                  partitions: int | None = None) -> DataFrame:
    """Halo-correct multi-level contour crossing counts: ``conv`` holds
    the stacked per-level count planes, ``conv_sum`` the tile's total
    crossings over all levels."""
    lv = tuple(float(x) for x in levels)
    return _apply_padded(tiles, lambda zp: contour_crossings(zp, lv),
                         tile, partitions)


def morph_tiles(tiles: DataFrame, op: str = "dilate", tile: int = TILE,
                partitions: int | None = None) -> DataFrame:
    """3x3 morphological dilate/erode over image tiles, halo-correct
    (same seam guarantee as convolve_tiles; borders see the gdaldem
    extrapolation pad, identical to operating on the whole plane)."""
    if op not in ("dilate", "erode"):
        raise ValueError(op)
    return _apply_padded(tiles, lambda zp: morph3(zp, op), tile, partitions)


# -------------------------------------------------------------- resample
def bilinear2x(zp: np.ndarray) -> np.ndarray:
    """2x bilinear upsample of a 1-px-padded f64 block -> (2t, 2w).

    Half-pixel-center (align_corners=False) sampling: output index o
    samples input coordinate (o + 0.5)/2 - 0.5, so even rows mix
    (0.25 up, 0.75 center) and odd rows (0.75 center, 0.25 down) --
    weights fall on the 1-px halo only, which is why the same ring-1
    exchange that serves the 3x3 kernels serves resampling.  Identical
    expression order in engine and plane model -> bit-equal."""
    t, w = zp.shape[0] - 2, zp.shape[1] - 2
    c = zp[1:t + 1]
    rows = np.empty((2 * t, w + 2), dtype=np.float64)
    rows[0::2] = 0.25 * zp[0:t] + 0.75 * c
    rows[1::2] = 0.75 * c + 0.25 * zp[2:t + 2]
    out = np.empty((2 * t, 2 * w), dtype=np.float64)
    cc = rows[:, 1:w + 1]
    out[:, 0::2] = 0.25 * rows[:, 0:w] + 0.75 * cc
    out[:, 1::2] = 0.75 * cc + 0.25 * rows[:, 2:w + 2]
    return out


def resample_tiles(tiles: DataFrame, tile: int = TILE,
                   partitions: int | None = None) -> DataFrame:
    """Halo-correct 2x bilinear upsample: each 64x64 tile becomes a
    128x128 tile, and the concatenation is bit-identical to upsampling
    the whole plane at once (same seam guarantee as convolve_tiles)."""
    return _apply_padded(tiles, bilinear2x, tile, partitions)
