"""Distributed affine raster warp (the gdalwarp analogue): bilinear
resampling of a tiled raster onto an arbitrary target grid.

Sampling model (align_corners=False, the same half-pixel-center
convention as convolve.bilinear2x): target pixel (yt, xt) samples source
coordinate

    ys = (yt + 0.5) / sy - 0.5 + oy        (sx/ox analogous)

with bilinear interpolation of the 4 surrounding source pixels; source
coordinates that fall up to 1 px outside the raster use the gdaldem
COMPUTE_EDGES linear extrapolation pad, exactly like every other halo
operator in this engine, so engine output is bit-comparable to warping
the whole plane at once (terraspark.warp.warp_plane is the shared
reference path).

Distributed shape -- an EXCHANGE, not a halo: the warp's data dependency
is many-to-many (each target tile reads a sampling window of the source),
so each SOURCE tile is emitted to every TARGET tile whose window
intersects it.  The per-tile fan-out is bounded by
(T*sy/T + 2) * (T*sx/T + 2) -- a small constant for moderate scale
factors (~4 for a half-scale warp) -- and the shuffle key
(image_id, band, target tile) is uniform, no skew.  At production scale
the emit would slice each source tile to the exact sub-window each
target needs (cutting shuffled bytes toward 1x); here whole tiles ship
for simplicity and the audit column records the bound.

One Python call per partition (sorted contiguous groups, the
dem.derive_features pattern); all sampling is vectorized numpy over the
assembled source canvas.
"""
from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .config import TILE

_EMIT_SCHEMA = ("image_id string, band int, tty int, ttx int, sy_t int, "
                "sx_t int, data binary")
_OUT_SCHEMA = ("image_id string, band int, tile_x int, tile_y int, "
               "px binary, warp_sum double")


class WarpSpec:
    """Affine warp parameters: source (h, w) -> target (ht, wt) with
    per-axis scale s* = target/source pixels and source-pixel offsets."""

    def __init__(self, h: int, w: int, ht: int, wt: int,
                 oy: float = 0.0, ox: float = 0.0, tile: int = TILE):
        if ht % tile or wt % tile:
            raise ValueError("target dims must be tile-aligned")
        self.h, self.w, self.ht, self.wt = h, w, ht, wt
        self.sy, self.sx = ht / h, wt / w
        self.oy, self.ox = oy, ox
        self.tile = tile
        # The extrapolation pad in _fill_canvas covers EXACTLY one pixel
        # outside the source (indices -1 and h/w); a spec whose offsets
        # or downscale push bilinear sampling further out would leave NaN
        # canvas cells that silently propagate into output tiles, so
        # validate the documented 1-px contract up front.
        for axis, src in (("y", h), ("x", w)):
            s = self.sy if axis == "y" else self.sx
            o = oy if axis == "y" else ox
            n_t = ht if axis == "y" else wt
            lo = math.floor(0.5 / s - 0.5 + o)           # first sampled idx
            hi = math.floor((n_t - 0.5) / s - 0.5 + o) + 1   # last (bilinear)
            if lo < -1 or hi > src:
                raise ValueError(
                    f"WarpSpec samples source {axis} in [{lo}, {hi}] but "
                    f"the extrapolation pad only covers [-1, {src}]; "
                    f"reduce |o{axis}| or the downscale factor")

    def src_coords(self, axis: str, t0: int, t1: int) -> np.ndarray:
        """Source sampling coordinates for target pixels [t0, t1)."""
        s = self.sy if axis == "y" else self.sx
        o = self.oy if axis == "y" else self.ox
        return (np.arange(t0, t1, dtype=np.float64) + 0.5) / s - 0.5 + o

    def target_tile_range(self, axis: str, a: int, b: int) -> range:
        """Target tile indices whose sampling window can touch source
        rows/cols [a, b) (with the +-1 bilinear/pad slack)."""
        s = self.sy if axis == "y" else self.sx
        o = self.oy if axis == "y" else self.ox
        n_t = (self.ht if axis == "y" else self.wt) // self.tile
        lo = (a - 2 + 0.5 - o) * s - 0.5
        hi = (b + 1 + 0.5 - o) * s - 0.5
        t0 = max(0, int(math.floor(lo)) // self.tile)
        t1 = min(n_t - 1, int(math.ceil(hi)) // self.tile)
        return range(t0, t1 + 1)


def _emit(batches: Iterator[pd.DataFrame], spec: WarpSpec) -> Iterator[pd.DataFrame]:
    t = spec.tile
    for pdf in batches:
        if not len(pdf):
            continue
        rows = {k: [] for k in ("image_id", "band", "tty", "ttx",
                                "sy_t", "sx_t", "data")}
        for r in pdf.itertuples(index=False):
            tys = spec.target_tile_range("y", r.tile_y * t, (r.tile_y + 1) * t)
            txs = spec.target_tile_range("x", r.tile_x * t, (r.tile_x + 1) * t)
            for tty in tys:
                for ttx in txs:
                    rows["image_id"].append(r.image_id)
                    rows["band"].append(r.band)
                    rows["tty"].append(tty)
                    rows["ttx"].append(ttx)
                    rows["sy_t"].append(r.tile_y)
                    rows["sx_t"].append(r.tile_x)
                    rows["data"].append(r.px)
        yield pd.DataFrame(rows)


def _canvas_bounds(ys: np.ndarray, xs: np.ndarray):
    r0 = int(np.floor(ys.min()))
    r1 = int(np.floor(ys.max())) + 1
    c0 = int(np.floor(xs.min()))
    c1 = int(np.floor(xs.max())) + 1
    return r0, r1, c0, c1


def _fill_canvas(g: pd.DataFrame, spec: WarpSpec, r0, r1, c0, c1):
    """Assemble the source window [r0, r1] x [c0, c1] (inclusive) from the
    group's tiles; indices -1/h (or -1/w) fill with the linear
    extrapolation pad.  Returns float64 canvas."""
    t = spec.tile
    cv = np.full((r1 - r0 + 1, c1 - c0 + 1), np.nan, dtype=np.float64)
    for r in g.itertuples(index=False):
        a, b = r.sy_t * t, (r.sy_t + 1) * t
        ca, cb = r.sx_t * t, (r.sx_t + 1) * t
        ra, rb = max(a, max(r0, 0)), min(b, min(r1, spec.h - 1) + 1)
        cca, ccb = max(ca, max(c0, 0)), min(cb, min(c1, spec.w - 1) + 1)
        if ra >= rb or cca >= ccb:
            continue
        blk = np.frombuffer(r.data, dtype="<f4").reshape(t, t) \
            .astype(np.float64)
        cv[ra - r0:rb - r0, cca - c0:ccb - c0] = \
            blk[ra - a:rb - a, cca - ca:ccb - ca]
    # extrapolation pads (same 2*edge - next rule as kernels.pad_extrapolate,
    # rows first then columns, matching the full-plane padded oracle)
    if r0 == -1:
        cv[0] = 2.0 * cv[1] - cv[2]
    if r1 == spec.h:
        cv[-1] = 2.0 * cv[-2] - cv[-3]
    if c0 == -1:
        cv[:, 0] = 2.0 * cv[:, 1] - cv[:, 2]
    if c1 == spec.w:
        cv[:, -1] = 2.0 * cv[:, -2] - cv[:, -3]
    return cv


def _sample(cv: np.ndarray, ys: np.ndarray, xs: np.ndarray, r0: int,
            c0: int) -> np.ndarray:
    """Vectorized bilinear sampling -- the EXACT expression order shared
    with warp_plane so tiled output is bit-identical."""
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    iy0 = y0 - r0
    ix0 = x0 - c0
    v00 = cv[np.ix_(iy0, ix0)]
    v01 = cv[np.ix_(iy0, ix0 + 1)]
    v10 = cv[np.ix_(iy0 + 1, ix0)]
    v11 = cv[np.ix_(iy0 + 1, ix0 + 1)]
    return ((1.0 - fy) * ((1.0 - fx) * v00 + fx * v01)
            + fy * ((1.0 - fx) * v10 + fx * v11))


def _make_assembler(spec: WarpSpec):
    t = spec.tile
    cols = ("image_id", "band", "tile_x", "tile_y", "px", "warp_sum")

    def one(key, g: pd.DataFrame, out: dict):
        image_id, band, tty, ttx = key
        ys = spec.src_coords("y", tty * t, (tty + 1) * t)
        xs = spec.src_coords("x", ttx * t, (ttx + 1) * t)
        r0, r1, c0, c1 = _canvas_bounds(ys, xs)
        cv = _fill_canvas(g, spec, r0, r1, c0, c1)
        res = _sample(cv, ys, xs, r0, c0)
        out["image_id"].append(image_id)
        out["band"].append(int(band))
        out["tile_x"].append(int(ttx))
        out["tile_y"].append(int(tty))
        out["px"].append(np.ascontiguousarray(res, dtype="<f4").tobytes())
        out["warp_sum"].append(float(res.sum()))

    def run(batches):
        leftover = None
        keys = ["image_id", "band", "tty", "ttx"]
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


def warp_tiles(tiles: DataFrame, spec: WarpSpec,
               partitions: int | None = None) -> DataFrame:
    """tiles(image_id, band, tile_x, tile_y, px) -> warped target tiles
    (px f32 binary + f64 warp_sum audit).  One exchange keyed by the
    TARGET tile, sorted-partition assembler."""
    spark = tiles.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = tiles.select("image_id", "band", "tile_x", "tile_y", "px")
    emitted = base.mapInPandas(lambda it: _emit(it, spec),
                               schema=_EMIT_SCHEMA)
    shuffled = emitted.repartition(partitions, "image_id", "band", "tty") \
        .sortWithinPartitions("image_id", "band", "tty", "ttx")
    return shuffled.mapInPandas(_make_assembler(spec), schema=_OUT_SCHEMA)


def warp_plane(z: np.ndarray, spec: WarpSpec) -> np.ndarray:
    """Full-plane reference warp (the numpy oracle path): pad once, same
    sampling expression as _sample -- bit-identical to the tiled engine."""
    from .kernels import pad_extrapolate
    zp = pad_extrapolate(z.astype(np.float64))
    ys = spec.src_coords("y", 0, spec.ht)
    xs = spec.src_coords("x", 0, spec.wt)
    # the padded plane shifts indices by +1, i.e. canvas origin (-1, -1)
    return _sample(zp, ys, xs, -1, -1)
