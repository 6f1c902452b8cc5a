"""Single-process numpy reference model (the correctness oracle).

Re-implements the reference plugin's whole-scene execution faithfully:
per image, derive slope/aspect/luminance from the full DEM grid
(execution_context.py:193-294), compute global per-band scalars
(canonical sufficient statistics -- see scene_scalars for why the
plugin's np.polyfit is kept only as the tolerance cross-check:
LuminanceRegressionTopoCorrectionAlgorithm.py:30-35,
MinnaertTopoCorrectionAlgorithm.py:110-115), then apply the per-pixel
kernels (shared module terraspark.kernels).  The Spark engine must match
this model per-tile (allclose; PSNR>=40dB after the lossy codec).  What
this model validates INDEPENDENTLY of the engine: decode, tiling
geometry, cell assignment, the DEM join (model uses direct array
windows, engine a distributed key join), halo-exchange terrain
derivation, per-pixel kernel application over Arrow batches, every
downstream aggregation, and that the distributed scalar stage loses or
duplicates no tile (a grouping error would shift sums by whole tiles).
The scalar FIT formulas are shared code, cross-checked against
np.polyfit in test_scalar_parity and against literal hand cases in
test_units.
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
    """(intercept, slope) via np.polynomial.polynomial.polyfit(x, y, 1) --
    the reference plugin's fit routine, kept as the INDEPENDENT check of
    the closed-form path (tests/test_scalar_parity.py asserts the
    canonical scalars below agree with this to tight relative tolerance
    on every fixture band)."""
    intercept, slope = np.polynomial.polynomial.polyfit(
        x.astype(np.float64), y.astype(np.float64), 1)
    return float(intercept), float(slope)


def _tile_blocks(a: np.ndarray) -> np.ndarray:
    """(H, W) -> (n_tiles, TILE*TILE) in raster (tile_y, tile_x) order --
    the engine's canonical fold order."""
    nty, ntx = a.shape[0] // TILE, a.shape[1] // TILE
    return a.reshape(nty, TILE, ntx, TILE).transpose(0, 2, 1, 3) \
        .reshape(nty * ntx, TILE * TILE)


def scene_scalars(px: np.ndarray, lum: np.ndarray, slope: np.ndarray,
                  params: CorrectionParams) -> list[dict[str, float]]:
    """Whole-scene global scalars per band, computed via the CANONICAL
    sufficient-statistics path: per-tile partials
    (kernels.partial_stats_tiles) folded left-to-right in raster
    (tile_y, tile_x) order, then the closed-form OLS
    (kernels.scalars_from_stats) -- BIT-IDENTICAL to what the engine's
    distributed scalar stage produces at any parallelism.

    Why shared code here instead of the plugin's np.polyfit: veca/teillet
    denominators cross zero inside ill-conditioned scenes, so ANY
    last-ulp difference between oracle and engine scalars flips their
    where-masks at a handful of knife-edge pixels and visibly moves cell
    statistics -- expectations built on polyfit scalars were only ever
    session-luck-stable.  The scalar FIT itself is still independently
    validated: test_scalar_parity asserts these canonical scalars match
    np.polynomial.polyfit (``_polyfit1``) within tight relative
    tolerance on every fixture band, and tests/test_units pins
    partial_stats/ols_from_sums against literal hand-computed cases."""
    from .kernels import partial_stats_tiles, scalars_from_stats

    out = []
    lum_t = _tile_blocks(lum.astype(np.float32, copy=False))
    slope_t = _tile_blocks(slope.astype(np.float32, copy=False))
    for b in range(BANDS):
        dn_t = _tile_blocks(px[b])
        st = partial_stats_tiles(dn_t, lum_t, slope_t, params)
        sums = {f: 0.0 for f in st}
        for f, vals in st.items():
            acc = 0.0
            for v in vals:                    # left fold, canonical order
                acc += float(v)
            sums[f] = acc
        out.append(scalars_from_stats(sums))
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

    # ----------------------------------------------------- metrics oracle
    def tile_groups(self) -> pd.DataFrame:
        """(image_id, tile_x, tile_y, cell, group_id) via AOI cell covers
        (tile-granular classification, the engine's containment-join
        analogue of the reference's group raster, eval.py:134-141)."""
        assign = self.expected_assignments()
        covers = []
        for _, r in self.aoi.iterrows():
            covers.append(pd.DataFrame({
                "cell": [int(c) for c in r["cells"]],
                "group_id": r["aoi_id"]}))
        cover = pd.concat(covers, ignore_index=True)
        return assign.merge(cover, on="cell", how="inner")

    def _group_pixels(self, image_id: str, arr_by_band: np.ndarray,
                      tiles: pd.DataFrame):
        """Concatenate per-tile pixel vectors (and luminance) for one image
        restricted to the given tile list."""
        vals = {b: [] for b in range(BANDS)}
        lums = {b: [] for b in range(BANDS)}
        for t in tiles.itertuples(index=False):
            lum_t = self.luminance_tile(image_id, t.tile_x, t.tile_y).ravel()
            for b in range(BANDS):
                v = arr_by_band[b][t.tile_y * TILE:(t.tile_y + 1) * TILE,
                                   t.tile_x * TILE:(t.tile_x + 1) * TILE].ravel()
                vals[b].append(v)
                lums[b].append(lum_t)
        return ({b: np.concatenate(vals[b]) for b in vals},
                {b: np.concatenate(lums[b]) for b in lums})

    def expected_metrics(self) -> pd.DataFrame:
        """Long metric table (group_id, method, band, metric_id, value)
        mirroring terraspark.metrics.evaluate_metrics (metrics.py:81-206
        formulas; finite pixels only)."""
        groups = self.tile_groups()
        rows = []
        for gid, gtiles in groups.groupby("group_id"):
            # gather value/lum arrays per method/band across all images
            per_method: dict[str, dict[int, list]] = {}
            lum_acc: dict[int, list] = {b: [] for b in range(BANDS)}
            for iid, itiles in gtiles.groupby("image_id"):
                sources = {"__orig__": self._decoded[iid]}
                for m in self.methods:
                    sources[m] = self._corrected[iid][m]
                lum_done = False
                for m, arr in sources.items():
                    vals, lums = self._group_pixels(iid, arr, itiles)
                    d = per_method.setdefault(m, {b: [] for b in range(BANDS)})
                    for b in range(BANDS):
                        d[b].append((vals[b], lums[b]))
            orig_minmax = {}
            for b in range(BANDS):
                pairs = per_method["__orig__"][b]
                v = np.concatenate([p[0] for p in pairs]).astype(np.float64)
                v = v[np.isfinite(v)]
                orig_minmax[b] = (v.min(), v.max())
            for m, bands_d in per_method.items():
                for b, pairs in bands_d.items():
                    v = np.concatenate([p[0] for p in pairs]).astype(np.float64)
                    lu = np.concatenate([p[1] for p in pairs]).astype(np.float64)
                    fin = np.isfinite(v)
                    v, lu = v[fin], lu[fin]
                    q1, med, q3 = np.percentile(v, [25, 50, 75])
                    omin, omax = orig_minmax[b]
                    r = np.corrcoef(v, lu)[0, 1]
                    vals = {
                        "std_reduction": float(np.std(v)),
                        "cv_reduction": float(np.std(v) / np.mean(v)),
                        "iqr_reduction": float(q3 - q1),
                        "relative_median_difference": float(med),
                        "outliers_threshold": float(
                            np.count_nonzero((v < omin) | (v > omax))),
                        "outliers_iqr": float(np.count_nonzero(
                            (v < q1 - (q3 - q1)) | (v > q3 + (q3 - q1)))),
                        "determination_coefficient": float(r * r),
                    }
                    for mid, val in vals.items():
                        rows.append({"group_id": int(gid), "method": m,
                                     "band": b, "metric_id": mid,
                                     "value": val})
        return pd.DataFrame(rows)

    def _terrain_tile(self, image_id: str, which: int, tile_x: int,
                      tile_y: int):
        """which: 0=slope, 1=aspect, 2=luminance (radians/cos-i float32)."""
        hill, y0, x0 = self._windows[image_id]
        arr = self.feats[hill][which]
        return arr[y0 + tile_y * TILE:y0 + (tile_y + 1) * TILE,
                   x0 + tile_x * TILE:x0 + (tile_x + 1) * TILE]

    def _orig_group_arrays(self):
        """Per (group_id, band): concatenated (dn, lum, slope_deg,
        aspect_deg) over finite original pixels."""
        groups = self.tile_groups()
        out = {}
        for (gid, iid), gtiles in groups.groupby(["group_id", "image_id"]):
            px = self._decoded[iid]
            for t in gtiles.itertuples(index=False):
                sl = np.degrees(self._terrain_tile(iid, 0, t.tile_x, t.tile_y)
                                .astype(np.float64)).ravel()
                asp = np.degrees(self._terrain_tile(iid, 1, t.tile_x, t.tile_y)
                                 .astype(np.float64)).ravel()
                lu = self._terrain_tile(iid, 2, t.tile_x, t.tile_y) \
                    .astype(np.float64).ravel()
                for b in range(BANDS):
                    v = px[b][t.tile_y * TILE:(t.tile_y + 1) * TILE,
                              t.tile_x * TILE:(t.tile_x + 1) * TILE] \
                        .astype(np.float64).ravel()
                    fin = np.isfinite(v)
                    d = out.setdefault((int(gid), b),
                                       {"v": [], "lum": [], "sl": [], "asp": []})
                    d["v"].append(v[fin])
                    d["lum"].append(lu[fin])
                    d["sl"].append(sl[fin])
                    d["asp"].append(asp[fin])
        return {k: {kk: np.concatenate(vv) for kk, vv in d.items()}
                for k, d in out.items()}

    def expected_rose(self, slope_step: float = 30.0,
                      aspect_step: float = 10.0) -> pd.DataFrame:
        """A13 rose-diagram bins: (slope//step, aspect//step) -> mean DN of
        the ORIGINAL image per group/band (rose_diagram_eval.py:104-106,
        224-233; non-empty bins only -- the engine's groupBy analogue of
        npg.aggregate's dense fill)."""
        rows = []
        for (gid, b), d in sorted(self._orig_group_arrays().items()):
            sb = np.floor(d["sl"] / slope_step).astype(int)
            ab = np.floor(d["asp"] / aspect_step).astype(int)
            key = sb * 10_000 + ab
            for k in np.unique(key):
                m = key == k
                rows.append({
                    "group_id": gid, "band": b,
                    "slope_bin": int(k // 10_000), "aspect_bin": int(k % 10_000),
                    "mean_value": float(d["v"][m].mean()),
                    "n": int(m.sum()),
                })
        return pd.DataFrame(rows)

    def expected_rose_stats(self, slope_step: float = 30.0,
                            aspect_step: float = 10.0) -> pd.DataFrame:
        """A14 descriptive bundle over the rose bin means per (group, band):
        mean, std, percentiles 0/50/95/97/99
        (rose_diagram_eval.py:50-58 compute_statistics)."""
        rose = self.expected_rose(slope_step, aspect_step)
        rows = []
        for (gid, b), g in rose.groupby(["group_id", "band"]):
            v = g["mean_value"].to_numpy(dtype=np.float64)
            pcts = np.percentile(v, [0, 50, 95, 97, 99])
            rows.append({
                "group_id": int(gid), "band": int(b),
                "mean": float(v.mean()), "stddev": float(np.std(v)),
                "percentile_0": float(pcts[0]),
                "percentile_50": float(pcts[1]),
                "percentile_95": float(pcts[2]),
                "percentile_97": float(pcts[3]),
                "percentile_99": float(pcts[4]),
            })
        return pd.DataFrame(rows)

    def expected_correlation_fit(self) -> pd.DataFrame:
        """A3 in the evaluation path: per (group, band) OLS fit of original
        DN ~ luminance over ALL pixels (correlation_eval.py:100 --
        np.polynomial.polynomial.polyfit, no threshold mask)."""
        rows = []
        for (gid, b), d in sorted(self._orig_group_arrays().items()):
            intercept, slope = np.polynomial.polynomial.polyfit(
                d["lum"], d["v"], 1)
            rows.append({"group_id": gid, "band": b,
                         "intercept": float(intercept),
                         "slope": float(slope), "n": int(d["v"].size)})
        return pd.DataFrame(rows)

    def expected_hist2d(self, bins: int = 50) -> pd.DataFrame:
        """A12 luminance x DN 2-D histogram of the ORIGINAL image per
        group/band (correlation_eval.py:93-98 semantics: lum range [0,1],
        DN range [min,max]; same floor binning as the engine)."""
        rows = []
        for (gid, b), d in sorted(self._orig_group_arrays().items()):
            v, lu = d["v"], d["lum"]
            vmin, vmax = v.min(), v.max()
            keep = (lu >= 0) & (lu <= 1) & (v >= vmin) & (v <= vmax)
            bx = np.minimum(np.floor(lu[keep] * bins), bins - 1).astype(int)
            by = np.minimum(np.floor((v[keep] - vmin)
                                     / ((vmax - vmin) / bins)),
                            bins - 1).astype(int)
            key = bx * 10_000 + by
            uk, cnt = np.unique(key, return_counts=True)
            for k, c in zip(uk, cnt):
                rows.append({"group_id": gid, "band": b,
                             "bin_x": int(k // 10_000),
                             "bin_y": int(k % 10_000), "count": int(c)})
        return pd.DataFrame(rows)

    def expected_cell_stats(self) -> pd.DataFrame:
        """Raster->vector: per (cell, method, band) aggregate stats of the
        corrected pixels (independent numpy path: np.mean/np.std on the
        concatenated arrays)."""
        assign = self.expected_assignments()
        acc: dict[tuple, list] = {}
        for t in assign.itertuples(index=False):
            for m in self.methods:
                arr = self._corrected[t.image_id][m]
                for b in range(BANDS):
                    v = arr[b][t.tile_y * TILE:(t.tile_y + 1) * TILE,
                               t.tile_x * TILE:(t.tile_x + 1) * TILE].ravel()
                    acc.setdefault((t.cell, m, b), []).append(
                        v[np.isfinite(v)].astype(np.float64))
        rows = []
        for (cell, m, b), chunks in sorted(acc.items()):
            v = np.concatenate(chunks)
            rows.append({
                "cell": int(cell), "method": m, "band": b, "n": int(v.size),
                "mean": float(v.mean()), "std": float(np.std(v)),
                "vmin": float(v.min()), "vmax": float(v.max()),
            })
        return pd.DataFrame(rows)

    def expected_cell_base(self, method: str = "cosine_t") -> pd.DataFrame:
        """FULL-PRECISION per (cell, band) mergeable partials (n, s, ss,
        min, max) of one method's corrected pixels -- the committed base
        the rollup/polygonize SQL oracles re-aggregate (so the oracle does
        its own parent-key arithmetic and connected components over data
        that never touched Spark)."""
        assign = self.expected_assignments()
        acc: dict[tuple, list] = {}
        for t in assign.itertuples(index=False):
            arr = self._corrected[t.image_id][method]
            for b in range(BANDS):
                v = arr[b][t.tile_y * TILE:(t.tile_y + 1) * TILE,
                           t.tile_x * TILE:(t.tile_x + 1) * TILE].ravel()
                acc.setdefault((t.cell, b), []).append(
                    v[np.isfinite(v)].astype(np.float64))
        rows = []
        for (cell, b), chunks in sorted(acc.items()):
            v = np.concatenate(chunks)
            rows.append({
                "cell": int(cell), "band": b, "n": int(v.size),
                "s": float(v.sum()), "ss": float((v * v).sum()),
                "vmin": float(v.min()), "vmax": float(v.max()),
            })
        return pd.DataFrame(rows)

    # ------------------------------------------- localized C-correction
    def local_c_tile(self, image_id: str, band: int, tile_x: int,
                     tile_y: int, k: int = 1) -> np.ndarray:
        """Oracle for terraspark.local_correction: c fit from the ring-k
        tile neighborhood's masked sufficient statistics (clipped at image
        borders), C3 formula applied to the center tile."""
        from .kernels import ols_from_sums
        px = self._decoded[image_id]
        thr = self.params.pixel_ignore_threshold
        n = sx = sy = sxx = sxy = 0.0
        for dy in range(-k, k + 1):
            for dx in range(-k, k + 1):
                tx, ty = tile_x + dx, tile_y + dy
                if not (0 <= tx < self.layout.tiles_x
                        and 0 <= ty < self.layout.tiles_y):
                    continue
                dn = px[band][ty * TILE:(ty + 1) * TILE,
                              tx * TILE:(tx + 1) * TILE].astype(np.float64)
                lum = self.luminance_tile(image_id, tx, ty).astype(np.float64)
                mask = (dn > thr) & ~np.isnan(dn)
                x = np.where(mask, lum, 0.0)
                y = np.where(mask, dn, 0.0)
                n += mask.sum()
                sx += x.sum(); sy += y.sum()
                sxx += (x * x).sum(); sxy += (x * y).sum()
        intercept, slope = ols_from_sums(n, sx, sy, sxx, sxy)
        c = intercept / slope
        dn = px[band][tile_y * TILE:(tile_y + 1) * TILE,
                      tile_x * TILE:(tile_x + 1) * TILE].astype(np.float32)
        lum = self.luminance_tile(image_id, tile_x, tile_y).astype(np.float32)
        with np.errstate(all="ignore"):
            out = dn * np.divide(np.float64(self.params.sza_cosine) + c,
                                 lum + c, dn.astype("float32"))
        out = out.astype(np.float32)
        out[np.isnan(dn)] = np.nan
        return out

    def expected_local_c_summary(self, round_to: int = 3) -> pd.DataFrame:
        rows = []
        for iid in self._decoded:
            for b in range(BANDS):
                for ty in range(self.layout.tiles_y):
                    for tx in range(self.layout.tiles_x):
                        t = self.local_c_tile(iid, b, tx, ty)
                        v = t[np.isfinite(t)].astype(np.float64)
                        rows.append({
                            "image_id": iid, "band": b, "tile_x": tx,
                            "tile_y": ty, "n_valid": int(v.size),
                            "mean_px": float(v.mean()) if v.size else 0.0,
                        })
        return pd.DataFrame(rows)

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
