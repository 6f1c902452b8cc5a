"""Single-process numpy reference model (the correctness oracle).

Re-implements the reference plugin's whole-scene execution faithfully:
per image, derive slope/aspect/luminance from the full DEM grid
(execution_context.py:193-294), compute global per-band scalars with
``np.polynomial.polynomial.polyfit`` exactly as the plugin does
(LuminanceRegressionTopoCorrectionAlgorithm.py:30-35,
MinnaertTopoCorrectionAlgorithm.py:110-115), then apply the per-pixel
kernels (shared module terraspark.kernels).  The Spark engine must match
this model per-tile (allclose; PSNR>=40dB after the lossy codec) -- the
scalar path is INDEPENDENT of the engine's distributed sufficient-stats
aggregation, so the comparison genuinely validates the distributed plan.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from . import cells, codecs
from .config import (BANDS, CELL_DEG, CELL_RES, IMG_H, IMG_W, TILE,
                     CorrectionParams, DEFAULT_PARAMS, METHODS, zero_noise)
from .fixtures import HILLS, Layout, dem_features, image_fmt
from .kernels import apply_correction, minnaert_xy


def _polyfit1(x: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """(intercept, slope) via np.polynomial.polynomial.polyfit(x, y, 1),
    matching the reference exactly."""
    intercept, slope = np.polynomial.polynomial.polyfit(
        x.astype(np.float64), y.astype(np.float64), 1)
    return float(intercept), float(slope)


def scene_scalars(px: np.ndarray, lum: np.ndarray, slope: np.ndarray,
                  params: CorrectionParams) -> list[dict[str, float]]:
    """Whole-scene global scalars per band, the plugin's driver-side path."""
    out = []
    lum_flat = lum.ravel().astype(np.float64)
    for b in range(BANDS):
        dn = px[b].ravel().astype(np.float64)
        valid = ~np.isnan(dn)
        dnv, lumv = dn[valid], lum_flat[valid]

        mask = dnv > params.pixel_ignore_threshold
        ri, rs = _polyfit1(lumv[mask], dnv[mask])

        mx, my = minnaert_xy(dn[valid].astype(np.float32),
                             lumv.astype(np.float32),
                             slope.ravel().astype(np.float32)[valid])
        mi, ms = _polyfit1(mx, my)

        out.append({
            "reg_intercept": ri, "reg_slope": rs, "c": ri / rs,
            "k": ms, "pbc_c": ms / mi,
            "band_mean": float(dnv.mean()),
            "lum_mean": float(lum_flat.mean()),
        })
    return out


class OracleRun:
    """Expected outputs for one fixture set (n_images)."""

    def __init__(self, n_images: int, images: pd.DataFrame,
                 scenes: pd.DataFrame, dem_grids: dict[int, np.ndarray],
                 aoi: pd.DataFrame,
                 params: CorrectionParams = DEFAULT_PARAMS,
                 methods: tuple[str, ...] = METHODS):
        self.params = params
        self.methods = methods
        self.layout = Layout(n_images)
        self.images = images
        self.scenes = scenes.set_index("image_id")
        self.aoi = aoi
        self.feats = {k: dem_features(dem_grids[k], params) for k in dem_grids}
        self._corrected: dict[str, dict[str, np.ndarray]] = {}
        self._decoded: dict[str, np.ndarray] = {}
        self._windows: dict[str, tuple[int, int, int]] = {}
        self._scalars: dict[str, list[dict[str, float]]] = {}
        self._run()

    # ------------------------------------------------------------- run
    def _run(self):
        for _, row in self.images.iterrows():
            iid = row["image_id"]
            i = int(iid.split("_")[1])
            hill = i % HILLS
            px = codecs.decode(row["bytes"], row["fmt"], BANDS, IMG_H, IMG_W)
            cx, cy = self.layout.anchor_cell(i)
            y0, x0 = cy * TILE, cx * TILE
            slope, aspect, lum = self.feats[hill]
            s_win = slope[y0:y0 + IMG_H, x0:x0 + IMG_W]
            l_win = lum[y0:y0 + IMG_H, x0:x0 + IMG_W]
            sc = scene_scalars(px, l_win, s_win, self.params)
            self._decoded[iid] = px
            self._windows[iid] = (hill, y0, x0)
            self._scalars[iid] = sc
            per_method = {}
            for m in self.methods:
                bands_out = np.empty_like(px)
                for b in range(BANDS):
                    bands_out[b] = apply_correction(
                        m, iid, b, px[b], l_win, s_win, sc[b], self.params)
                per_method[m] = bands_out
            self._corrected[iid] = per_method

    # -------------------------------------------------------- accessors
    def corrected_tile(self, image_id: str, method: str, band: int,
                       tile_x: int, tile_y: int) -> np.ndarray:
        arr = self._corrected[image_id][method][band]
        return arr[tile_y * TILE:(tile_y + 1) * TILE,
                   tile_x * TILE:(tile_x + 1) * TILE]

    def decoded(self, image_id: str) -> np.ndarray:
        return self._decoded[image_id]

    def scalars(self, image_id: str) -> list[dict[str, float]]:
        return self._scalars[image_id]

    def luminance_tile(self, image_id: str, tile_x: int, tile_y: int):
        hill, y0, x0 = self._windows[image_id]
        lum = self.feats[hill][2]
        return lum[y0 + tile_y * TILE:y0 + (tile_y + 1) * TILE,
                   x0 + tile_x * TILE:x0 + (tile_x + 1) * TILE]

    # --------------------------------------------------- expected tables
    def expected_assignments(self) -> pd.DataFrame:
        """Exact tile->cell assignment (north-rule gate)."""
        rows = []
        for iid in self._decoded:
            i = int(iid.split("_")[1])
            lat0, lon0 = self.layout.image_origin(i)
            for ty in range(self.layout.tiles_y):
                for tx in range(self.layout.tiles_x):
                    clat = lat0 - (ty + 0.5) * CELL_DEG   # row 0 = north
                    clon = lon0 + (tx + 0.5) * CELL_DEG
                    rows.append({
                        "image_id": iid, "tile_x": tx, "tile_y": ty,
                        "cell": int(cells.encode(clat, clon, CELL_RES)),
                    })
        return pd.DataFrame(rows).sort_values(
            ["image_id", "tile_y", "tile_x"]).reset_index(drop=True)

    def expected_join_counts(self) -> pd.DataFrame:
        """Exact join row counts: tile x DEM (per band) and tile x AOI."""
        assign = self.expected_assignments()
        dem_cells = set()
        for k, (s, a, l) in self.feats.items():
            lat0, lon0 = self.layout.region_origin(k)
            h, w = s.shape[0] // TILE, s.shape[1] // TILE
            for ty in range(h):
                for tx in range(w):
                    dem_cells.add(int(cells.encode(lat0 - (ty + .5) * CELL_DEG,
                                                   lon0 + (tx + .5) * CELL_DEG,
                                                   CELL_RES)))
        n_dem = int(assign["cell"].isin(dem_cells).sum()) * BANDS
        aoi_cells = set()
        for _, r in self.aoi.iterrows():
            aoi_cells.update(int(c) for c in r["cells"])
        n_aoi = int(assign["cell"].isin(aoi_cells).sum())
        return pd.DataFrame([
            {"stage": "tile_x_dem", "rows": n_dem},
            {"stage": "tile_x_aoi", "rows": n_aoi},
        ])

    def expected_correction_summary(self, round_to: int = 3) -> pd.DataFrame:
        """Per (image, band, method): valid-pixel count + rounded mean --
        the aggregate the driver's DuckDB oracle compares hash-exactly."""
        rows = []
        for iid, per_method in self._corrected.items():
            for m, arr in per_method.items():
                for b in range(BANDS):
                    v = arr[b][np.isfinite(arr[b])].astype(np.float64)
                    rows.append({
                        "image_id": iid, "band": b, "method": m,
                        "n_valid": int(v.size),
                        "mean_px": round(float(v.mean()), round_to),
                    })
        return pd.DataFrame(rows).sort_values(
            ["image_id", "band", "method"]).reset_index(drop=True)
