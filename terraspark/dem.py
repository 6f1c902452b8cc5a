"""Distributed DEM -> slope/aspect/luminance via ring-1 halo exchange.

The reference derives slope/aspect from the whole DEM with gdal:slope /
gdal:aspect (ZEVENBERGEN, COMPUTE_EDGES --
/root/reference/processing_alg/execution_context.py:193-262) and luminance
with a raster calc (:264-294).  Zevenbergen-Thorne needs a 1-pixel halo, so
a tiled distributed computation must exchange tile-edge strips between
cell-neighbors: each DEM tile emits its edge rows/cols/corners to the
neighboring cells (H3-like ring-1, SURVEY.md J5), a single shuffle gathers
(dem_id, cell) groups, and an ``applyInPandas`` stage assembles the padded
(TILE+2)^2 block and evaluates the shared numpy kernels.

Where a neighbor is missing (DEM boundary) the pad is filled by the same
linear extrapolation gdaldem COMPUTE_EDGES uses, in the same order as the
full-grid oracle (rows first, then columns), so engine output is
bit-comparable to the oracle everywhere including borders.

Scale notes: shuffle volume is ~1.03x the DEM (center tile + 4 thin strips
+ 4 corner pixels per tile); grouping key (dem_id, cell) is uniformly
distributed, no skew.  The derived table should be persisted and reused by
every correction, mirroring the reference's memoized slope/aspect/luminance
(execution_context.py:167-191).

Grid orientation: cell ilat grows northward; raster row 0 is the north
edge, so the cell to the north is tile row ty-1.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import cells
from .config import TILE, CorrectionParams
from .kernels import aspect_radians, luminance, slope_radians

HALO_SCHEMA = ("dem_id string, target long, role string, tile_x int, "
               "tile_y int, lat double, lon double, data binary")

FEATURES_SCHEMA = ("dem_id string, cell long, tile_x int, tile_y int, "
                   "lat double, lon double, slope binary, aspect binary, "
                   "lum binary")

# role -> (d_ilat, d_ilon) from sender to target
_EMITS = {
    "C": (0, 0),
    "N": (-1, 0),   # my bottom row is the NORTH halo of the cell south of me
    "S": (1, 0),    # my top row -> SOUTH halo of the cell north of me
    "W": (0, 1),    # my east col -> WEST halo of the cell east of me
    "E": (0, -1),   # my west col -> EAST halo of the cell west of me
    "NW": (-1, 1),  # my SE-most pixel... see _payload for exact pixels
    "NE": (-1, -1),
    "SW": (1, 1),
    "SE": (1, -1),
}


def _payload(z: np.ndarray, role: str) -> np.ndarray:
    if role == "C":
        return z
    if role == "N":      # sender is north of target: send bottom row
        return z[-1]
    if role == "S":      # sender south of target: send top row
        return z[0]
    if role == "W":      # sender west of target: send east col
        return z[:, -1]
    if role == "E":
        return z[:, 0]
    if role == "NW":     # sender is target's north-west: send SE pixel
        return z[-1:, -1]
    if role == "NE":
        return z[-1:, :1][0]
    if role == "SW":
        return z[:1, -1]
    if role == "SE":
        return z[:1, :1][0]
    raise ValueError(role)


def _batch_payload(a: np.ndarray, role: str) -> np.ndarray:
    """Vectorized ``_payload``: one strip slice of the stacked
    (n, tile, tile) batch per role (same pixels, batch-at-once)."""
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
    if role == "SE":
        return a[:, 0, 0].reshape(n, 1)
    raise ValueError(role)


def _emit_halo(batches: Iterator[pd.DataFrame], tile: int) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        n = len(pdf)
        a = np.frombuffer(b"".join(pdf["elev"].tolist()),
                          dtype="<f4").reshape(n, tile, tile)
        res, ilat, ilon = cells.decode(pdf["cell"].to_numpy(np.int64))
        dem_ids = pdf["dem_id"].to_numpy()
        txs = pdf["tile_x"].to_numpy()
        tys = pdf["tile_y"].to_numpy()
        lats = pdf["lat"].to_numpy()
        lons = pdf["lon"].to_numpy()
        neg1 = np.full(n, -1, dtype=txs.dtype)
        zero = np.zeros(n, dtype=np.float64)
        cols: dict[str, list] = {k: [] for k in (
            "dem_id", "target", "role", "tile_x", "tile_y", "lat", "lon",
            "data")}
        for role, (dla, dlo) in _EMITS.items():
            target = cells.from_indices(res, ilat + dla, ilon + dlo)
            p = np.ascontiguousarray(_batch_payload(a, role), dtype="<f4")
            is_c = role == "C"
            cols["dem_id"].append(dem_ids)
            cols["target"].append(target)
            cols["role"].append(np.full(n, role, dtype=object))
            cols["tile_x"].append(txs if is_c else neg1)
            cols["tile_y"].append(tys if is_c else neg1)
            cols["lat"].append(lats if is_c else zero)
            cols["lon"].append(lons if is_c else zero)
            cols["data"].append([r.tobytes() for r in p])
        yield pd.DataFrame({
            "dem_id": np.concatenate(cols["dem_id"]),
            "target": np.concatenate(cols["target"]),
            "role": np.concatenate(cols["role"]),
            "tile_x": np.concatenate(cols["tile_x"]),
            "tile_y": np.concatenate(cols["tile_y"]),
            "lat": np.concatenate(cols["lat"]),
            "lon": np.concatenate(cols["lon"]),
            "data": [b for block in cols["data"] for b in block]})


def assemble_padded(z: np.ndarray, strips: dict[str, np.ndarray],
                    tile: int) -> np.ndarray:
    """Assemble the (tile+2)^2 padded block; missing halo pieces are filled
    with gdaldem-style linear extrapolation in oracle order (rows, then
    columns) so borders match terraspark.kernels.pad_extrapolate exactly."""
    t = tile
    zp = np.empty((t + 2, t + 2), dtype=np.float64)
    zp[1:-1, 1:-1] = z
    zp[0, 1:-1] = strips["N"] if "N" in strips else 2 * z[0] - z[1]
    zp[-1, 1:-1] = strips["S"] if "S" in strips else 2 * z[-1] - z[-2]
    zp[1:-1, 0] = strips["W"] if "W" in strips else 2 * z[:, 0] - z[:, 1]
    zp[1:-1, -1] = strips["E"] if "E" in strips else 2 * z[:, -1] - z[:, -2]
    w = strips.get("W")
    e = strips.get("E")
    # corners: true diagonal pixel > vertical extrapolation of the side col
    # (DEM north/south edge) > horizontal extrapolation of the pad row
    if "NW" in strips:
        zp[0, 0] = strips["NW"][0]
    elif "N" not in strips and w is not None:
        zp[0, 0] = 2 * w[0] - w[1]
    else:
        zp[0, 0] = 2 * zp[0, 1] - zp[0, 2]
    if "NE" in strips:
        zp[0, -1] = strips["NE"][0]
    elif "N" not in strips and e is not None:
        zp[0, -1] = 2 * e[0] - e[1]
    else:
        zp[0, -1] = 2 * zp[0, -2] - zp[0, -3]
    if "SW" in strips:
        zp[-1, 0] = strips["SW"][0]
    elif "S" not in strips and w is not None:
        zp[-1, 0] = 2 * w[-1] - w[-2]
    else:
        zp[-1, 0] = 2 * zp[-1, 1] - zp[-1, 2]
    if "SE" in strips:
        zp[-1, -1] = strips["SE"][0]
    elif "S" not in strips and e is not None:
        zp[-1, -1] = 2 * e[-1] - e[-2]
    else:
        zp[-1, -1] = 2 * zp[-1, -2] - zp[-1, -3]
    return zp


def _assemble_group(dem_id, target, g: pd.DataFrame, tile: int,
                    params: CorrectionParams, out: dict,
                    emit_aspect: bool = True):
    roles = g["role"].to_numpy()
    cidx = np.where(roles == "C")[0]
    if not len(cidx):            # halo addressed to a cell with no DEM tile
        return
    crow = g.iloc[cidx[0]]
    z = np.frombuffer(crow["data"], dtype="<f4").reshape(tile, tile) \
        .astype(np.float64)
    data = g["data"].to_numpy()
    strips = {roles[i]: np.frombuffer(data[i], dtype="<f4").astype(np.float64)
              for i in range(len(g)) if roles[i] != "C"}
    zp = assemble_padded(z, strips, tile)
    slope = slope_radians(zp, params.pixel_size_m)
    aspect = aspect_radians(zp, params.pixel_size_m)
    lum = luminance(slope, aspect, params)
    out["dem_id"].append(dem_id)
    out["cell"].append(int(target))
    out["tile_x"].append(int(crow["tile_x"]))
    out["tile_y"].append(int(crow["tile_y"]))
    out["lat"].append(float(crow["lat"]))
    out["lon"].append(float(crow["lon"]))
    out["slope"].append(np.ascontiguousarray(slope, dtype="<f4").tobytes())
    if emit_aspect:
        out["aspect"].append(
            np.ascontiguousarray(aspect, dtype="<f4").tobytes())
    out["lum"].append(np.ascontiguousarray(lum, dtype="<f4").tobytes())


_OUT_COLS = ("dem_id", "cell", "tile_x", "tile_y", "lat", "lon",
             "slope", "aspect", "lum")


def _make_partition_assembler(tile: int, params: CorrectionParams,
                              emit_aspect: bool = True):
    """Process a whole sorted partition: groups are contiguous, so we buffer
    only the possibly-incomplete trailing group across Arrow batches --
    ONE Python call per partition instead of one per (dem_id, cell) group."""

    cols = _OUT_COLS if emit_aspect else tuple(
        c for c in _OUT_COLS if c != "aspect")

    def run(batches):
        leftover = None
        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_dem = pdf["dem_id"].iat[-1]
            last_tgt = pdf["target"].iat[-1]
            tail = (pdf["dem_id"] == last_dem) & (pdf["target"] == last_tgt)
            leftover = pdf[tail]
            head = pdf[~tail]
            if not len(head):
                continue
            out = {k: [] for k in cols}
            for (d, t), g in head.groupby(["dem_id", "target"], sort=False):
                _assemble_group(d, t, g, tile, params, out, emit_aspect)
            yield pd.DataFrame(out)
        if leftover is not None and len(leftover):
            out = {k: [] for k in cols}
            for (d, t), g in leftover.groupby(["dem_id", "target"], sort=False):
                _assemble_group(d, t, g, tile, params, out, emit_aspect)
            yield pd.DataFrame(out)

    return run


def derive_features(dem: DataFrame, params: CorrectionParams,
                    tile: int = TILE,
                    partitions: int | None = None,
                    emit_aspect: bool = True) -> DataFrame:
    """dem(dem_id, cell, tile_x, tile_y, lat, lon, elev) ->
    (dem_id, cell, ..., slope, aspect, lum) -- one shuffle, no skew:
    the halo rows are hash-repartitioned by (dem_id, target) and sorted
    within partitions so each (dem_id, cell) group is contiguous.

    ``emit_aspect=False`` computes aspect (luminance needs it) but skips
    serializing the 16 KB/tile aspect binary through Arrow: consumers
    that only join slope+lum (corrections.join_dem) cannot column-prune
    inside a mapInPandas output, so the pruning must happen here (guide:
    opaque functions defeat column pruning -- pass only what is used)."""
    if partitions is None:
        partitions = int(
            dem.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # the halo emit (decode + 9x fan-out per cell) runs BEFORE the halo
    # shuffle -- an under-split scan (one fat parquet file) would serialize
    # it into one task, the hidden Amdahl fraction of the whole derivation;
    # only shuffle when the scan really is too narrow for the cores
    if not dem.isStreaming:
        cores = dem.sparkSession.sparkContext.defaultParallelism
        if dem.rdd.getNumPartitions() < min(cores, partitions):
            dem = dem.repartition(partitions)
    halo = dem.mapInPandas(lambda it: _emit_halo(it, tile), schema=HALO_SCHEMA)
    shuffled = halo.repartition(partitions, "dem_id", "target") \
                   .sortWithinPartitions("dem_id", "target")
    schema = FEATURES_SCHEMA if emit_aspect else \
        FEATURES_SCHEMA.replace("aspect binary, ", "")
    return shuffled.mapInPandas(
        _make_partition_assembler(tile, params, emit_aspect), schema=schema)
