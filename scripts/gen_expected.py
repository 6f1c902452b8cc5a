"""Generate the committed oracle-expected parquet files under fixtures/.

Everything is produced by the single-process numpy reference model
(terraspark.reference_model) on the deterministic 8-image fixture set --
never by Spark -- so the driver's DuckDB oracle (read_parquet on these
files) independently cross-checks the distributed engine.

Run: python scripts/gen_expected.py   (idempotent; rewrites fixtures/)
"""
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraspark import codecs  # noqa: E402
from terraspark import dtypes  # noqa: E402
from terraspark.config import BANDS, IMG_H, IMG_W, TILE, half_up  # noqa: E402
from terraspark.fixtures import build_tables, typed_fmt  # noqa: E402
from terraspark.reference_model import OracleRun  # noqa: E402
from terraspark import rank as trank  # noqa: E402

N_IMAGES = 8
N_TYPED = 6   # one image per dtype of the full GDAL lattice (typed_fmt)
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")


def main():
    os.makedirs(OUT, exist_ok=True)
    images, scenes, dem, aoi, grids = build_tables(N_IMAGES)
    oracle = OracleRun(N_IMAGES, images, scenes, grids, aoi)

    oracle.expected_assignments().to_parquet(
        f"{OUT}/expected_assignments.parquet", index=False)
    oracle.expected_join_counts().to_parquet(
        f"{OUT}/expected_join_counts.parquet", index=False)

    summary = oracle.expected_correction_summary(round_to=10)
    summary["mean_px"] = summary["mean_px"].map(lambda v: half_up(v, 3))
    summary.to_parquet(f"{OUT}/expected_corrections.parquet", index=False)

    met = oracle.expected_metrics()
    met["value"] = met["value"].map(lambda v: half_up(v, 4))
    met.to_parquet(f"{OUT}/expected_metrics.parquet", index=False)

    ranks = []
    raw = oracle.expected_metrics()
    for gid in sorted(raw["group_id"].unique()):
        r = trank.rank_scores(
            raw[raw["group_id"] == gid][["method", "band", "metric_id", "value"]])
        r.insert(0, "group_id", int(gid))
        r.insert(1, "rnk", range(1, len(r) + 1))
        r["score"] = r["score"].map(lambda v: half_up(v, 3))
        ranks.append(r)
    pd.concat(ranks, ignore_index=True).to_parquet(
        f"{OUT}/expected_rank.parquet", index=False)

    rose = oracle.expected_rose()
    rose["mean_value"] = rose["mean_value"].map(lambda v: half_up(v, 4))
    rose.to_parquet(f"{OUT}/expected_rose.parquet", index=False)

    oracle.expected_hist2d().to_parquet(
        f"{OUT}/expected_hist2d.parquet", index=False)

    rs = oracle.expected_rose_stats()
    for c in [c for c in rs.columns if c not in ("group_id", "band")]:
        rs[c] = rs[c].map(lambda v: half_up(v, 4))
    rs.to_parquet(f"{OUT}/expected_rose_stats.parquet", index=False)

    cf = oracle.expected_correlation_fit()
    cf["intercept"] = cf["intercept"].map(lambda v: half_up(v, 4))
    cf["slope"] = cf["slope"].map(lambda v: half_up(v, 4))
    cf.to_parquet(f"{OUT}/expected_correlation_fit.parquet", index=False)

    # localized C-correction: FULL-precision means (the driver query turns
    # these into a tolerance verdict -- see __spark_entry__.img_correct_c_local)
    oracle.expected_local_c_summary().to_parquet(
        f"{OUT}/expected_local_c.parquet", index=False)

    cs = oracle.expected_cell_stats()
    for c in ("mean", "std", "vmin", "vmax"):
        cs[c] = cs[c].map(lambda v: half_up(v, 4))
    cs.to_parquet(f"{OUT}/expected_cell_stats.parquet", index=False)

    # full-precision per-cell partials (rollup / polygonize oracle base)
    oracle.expected_cell_base().to_parquet(
        f"{OUT}/expected_cell_base.parquet", index=False)

    # full-precision per-cell DEM elevation means (D8 flow routing
    # oracle base): same <f4 quantization + f64 widening + pairwise
    # mean as the dem table bytes the engine decodes, so engine and
    # model agree bit-for-bit
    drows = []
    for _, r in dem.iterrows():
        block = np.frombuffer(r["elev"], dtype="<f4") \
            .reshape(1, -1).astype(np.float64)
        drows.append({"dem_id": r["dem_id"], "cell": int(r["cell"]),
                      "elev": float(block.mean(axis=1)[0])})
    pd.DataFrame(drows).to_parquet(
        f"{OUT}/expected_dem_cells.parquet", index=False)

    # thumbnails / captions / phash (decode-level expectations)
    rows = []
    for _, r in images.iterrows():
        px = codecs.decode(r["bytes"], r["fmt"], BANDS, IMG_H, IMG_W)
        band = np.nan_to_num(px[0].astype(np.float64))
        rows.append({
            "image_id": r["image_id"], "caption": r["caption"],
            "mean_px": half_up(float(band.mean()), 4),
            # independent decode-level recompute of the input table's
            # perceptual hash (oracle for the phash near-dup join)
            "phash": int(codecs.dhash64(px)),
        })
    pd.DataFrame(rows).to_parquet(f"{OUT}/expected_images.parquet", index=False)

    # temporal median composite: scene_group = image index % 4, per-pixel
    # float64 nanmedian across each group's epoch stack, per 64x64 tile --
    # the plain-numpy model of composite.temporal_composite
    decoded = {}
    for idx, r in images.iterrows():
        g = int(r["image_id"][4:]) % 4
        decoded.setdefault(g, []).append(
            codecs.decode(r["bytes"], r["fmt"], BANDS, IMG_H, IMG_W))
    crows = []
    t = 64
    for g, planes in sorted(decoded.items()):
        stack = np.stack(planes).astype(np.float64)  # (k, bands, h, w)
        for b in range(BANDS):
            for ty in range(IMG_H // t):
                for tx in range(IMG_W // t):
                    blk = stack[:, b, ty * t:(ty + 1) * t,
                                tx * t:(tx + 1) * t]
                    comp = np.nanmedian(blk, axis=0)
                    valid = np.isfinite(comp)
                    crows.append({
                        "scene_group": g, "band": b,
                        "tile_x": tx, "tile_y": ty,
                        "n_epochs": len(planes),
                        "n_valid": int(valid.sum()),
                        "mean_val": half_up(float(np.nanmean(comp)), 4)
                        if valid.any() else None,
                    })
    cdf = pd.DataFrame(crows)
    cdf["n_valid"] = cdf["n_valid"].astype("int64")
    cdf.to_parquet(f"{OUT}/expected_composite.parquet", index=False)

    # overview pyramid: whole-plane 2x box-nanmean per level, stored
    # float32 between levels (the on-disk dtype), re-tiled at 64 -- the
    # plain-numpy model of overviews.overview_pyramid (band 0)
    orows = []
    t = 64
    for idx, r in images.iterrows():
        plane = codecs.decode(r["bytes"], r["fmt"], BANDS, IMG_H, IMG_W)[0] \
            .astype("<f4")
        for level in (1, 2):
            p64 = plane.astype(np.float64)
            h = p64.shape[0] // 2
            blk = p64.reshape(h, 2, h, 2).transpose(0, 2, 1, 3) \
                .reshape(h, h, 4)
            with np.errstate(all="ignore"):
                down = np.nanmean(blk, axis=2)
            plane = down.astype("<f4")
            # ceil-divide: a partial tile row/column still gets a parent
            # tile in the engine (NaN-padded quadrants), so the model
            # must emit it too
            nty = max(1, -(-plane.shape[0] // t))
            ntx = max(1, -(-plane.shape[1] // t))
            for ty in range(nty):
                for tx in range(ntx):
                    tile = np.full((t, t), np.nan, dtype=np.float64)
                    src = plane[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t] \
                        .astype(np.float64)
                    tile[:src.shape[0], :src.shape[1]] = src
                    valid = np.isfinite(tile)
                    orows.append({
                        "image_id": r["image_id"], "level": level,
                        "tile_x": tx, "tile_y": ty,
                        "n_valid": int(valid.sum()),
                        "mean_val": half_up(float(np.nanmean(tile)), 4)
                        if valid.any() else None,
                    })
    odf = pd.DataFrame(orows)
    odf["n_valid"] = odf["n_valid"].astype("int64")
    odf.to_parquet(f"{OUT}/expected_overviews.parquet", index=False)

    # lossy WRITE-path PSNR gate (north-rule >= 40 dB): the cosine_t
    # corrected plane (continuous values -- never on the quantizer
    # lattice, unlike a decode-again roundtrip which is degenerately
    # exact) pushed through the lossy codec, per-band PSNR via the plain
    # numpy path (codecs.psnr) -- independent of the engine's two-pass
    # dataflow reproduction of the quantizer
    prows = []
    for _, r in images.iterrows():
        if not codecs.is_lossy(r["fmt"]):
            continue
        corr = oracle._corrected[r["image_id"]]["cosine_t"]
        dec2 = codecs.decode(codecs.encode(corr, r["fmt"]), r["fmt"],
                             BANDS, IMG_H, IMG_W)
        for b in range(BANDS):
            p = codecs.psnr(corr[b], dec2[b])
            prows.append({"image_id": r["image_id"], "band": b,
                          "fmt": r["fmt"], "psnr": half_up(p, 3),
                          "pass_gate": bool(p >= 40.0)})
    pd.DataFrame(prows).to_parquet(f"{OUT}/expected_psnr.parquet", index=False)

    # histogram-equalization summary: the engine reduces nonzero bins in
    # ascending order with a left fold; this sequential loop reproduces
    # the identical f64 operation order, so values match bit-exactly
    # before the final half_up rounding
    hrows = []
    for _, r in images.iterrows():
        px = codecs.decode(r["bytes"], r["fmt"], BANDS, IMG_H, IMG_W)
        for b in range(BANDS):
            a = px[b].astype(np.float64)
            vals = a[np.isfinite(a)]
            lo = float(np.nanmin(px[b]))
            hi = float(np.nanmax(px[b]))
            bn = (vals - lo) / (hi - lo) * 256 if hi > lo \
                else np.zeros_like(vals)
            idx = np.clip(np.floor(bn), 0, 255).astype(np.int64)
            cnt = np.bincount(idx, minlength=256)
            n = int(cnt.sum())
            cum, s1, s2 = 0, 0.0, 0.0
            for bb in range(256):
                if cnt[bb] == 0:
                    continue
                cum += int(cnt[bb])
                c = cum / n
                s1 += c * int(cnt[bb])
                s2 += c * c * int(cnt[bb])
            mean = s1 / n
            var = max(s2 / n - mean * mean, 0.0)
            hrows.append({"image_id": r["image_id"], "band": b,
                          "n_px": n, "mean_eq": half_up(mean, 4),
                          "std_eq": half_up(float(np.sqrt(var)), 4)})
    pd.DataFrame(hrows).to_parquet(f"{OUT}/expected_histeq.parquet",
                                   index=False)

    # tile-boundary-correct convolution: the model convolves the WHOLE
    # plane (pad_extrapolate + shared conv3) and slices per-tile sums;
    # the engine must reproduce them from per-tile halo assembly
    from terraspark.convolve import KERNEL_GAUSS3, conv3
    from terraspark.kernels import pad_extrapolate
    crows = []
    n_tiles = IMG_W // TILE
    for _, r in images.iterrows():
        px = codecs.decode(r["bytes"], r["fmt"], BANDS, IMG_H, IMG_W)
        plane = px[0].astype(np.float64)
        conv = conv3(pad_extrapolate(plane), KERNEL_GAUSS3)
        for ty in range(IMG_H // TILE):
            for tx in range(n_tiles):
                blk = conv[ty * TILE:(ty + 1) * TILE,
                           tx * TILE:(tx + 1) * TILE]
                crows.append({
                    "image_id": r["image_id"], "tile_x": tx, "tile_y": ty,
                    "n_nan": int(np.isnan(blk).sum()),
                    "conv_sum": half_up(float(np.nansum(blk)), 4)})
    pd.DataFrame(crows).to_parquet(f"{OUT}/expected_convolve.parquet",
                                   index=False)

    # morphological dilate: same plane-vs-tiles independence
    from terraspark.convolve import morph3
    mrows = []
    for _, r in images.iterrows():
        px = codecs.decode(r["bytes"], r["fmt"], BANDS, IMG_H, IMG_W)
        plane = px[0].astype(np.float64)
        dil = morph3(pad_extrapolate(plane), "dilate")
        for ty in range(IMG_H // TILE):
            for tx in range(n_tiles):
                blk = dil[ty * TILE:(ty + 1) * TILE,
                          tx * TILE:(tx + 1) * TILE]
                mrows.append({
                    "image_id": r["image_id"], "tile_x": tx, "tile_y": ty,
                    "n_nan": int(np.isnan(blk).sum()),
                    "conv_sum": half_up(float(np.nansum(blk)), 4)})
    pd.DataFrame(mrows).to_parquet(f"{OUT}/expected_morph.parquet",
                                   index=False)

    # bilinear 2x upsample: plane-level model, per-128x128-tile sums
    from terraspark.convolve import bilinear2x
    rrows = []
    for _, r in images.iterrows():
        px = codecs.decode(r["bytes"], r["fmt"], BANDS, IMG_H, IMG_W)
        up = bilinear2x(pad_extrapolate(px[0].astype(np.float64)))
        for ty in range(IMG_H // TILE):
            for tx in range(n_tiles):
                blk = up[ty * 2 * TILE:(ty + 1) * 2 * TILE,
                         tx * 2 * TILE:(tx + 1) * 2 * TILE]
                rrows.append({
                    "image_id": r["image_id"], "tile_x": tx, "tile_y": ty,
                    "n_nan": int(np.isnan(blk).sum()),
                    "conv_sum": half_up(float(np.nansum(blk)), 4)})
    pd.DataFrame(rrows).to_parquet(f"{OUT}/expected_resample.parquet",
                                   index=False)

    # DEM feature checksums per dem_id
    drows = []
    for k, (slope, aspect, lum) in sorted(oracle.feats.items()):
        drows.append({
            "dem_id": f"dem_{k}",
            "n_cells": int(slope.size // (TILE * TILE)),
            "slope_sum": half_up(float(slope.astype(np.float64).sum()), 2),
            "lum_sum": half_up(float(lum.astype(np.float64).sum()), 2),
        })
    pd.DataFrame(drows).to_parquet(f"{OUT}/expected_dem.parquet", index=False)

    # cartographic hillshade (NW sun 315/45) over the same full-grid
    # slope/aspect: shadow pixels are EXACT zeros (fmax clamp), so
    # n_shadow is an integer invariant the tiled engine must reproduce
    from terraspark.kernels import hillshade
    hsrows = []
    for k, (slope, aspect, lum) in sorted(oracle.feats.items()):
        sh = hillshade(slope, aspect)
        low = hillshade(slope, aspect, altitude_deg=10.0)
        # mean (not sum): the 255-scaled full-grid sum is large enough
        # that f64 summation-order noise could graze a 2-dp rounding
        # boundary; the mean divides that noise by n_px.  The shadow
        # count uses a GRAZING 10-degree sun: the fixture hills slope up
        # to ~20 degrees, so ~8% of hilly pixels clamp to exact 0 while
        # the flat dem_3 casts none -- a discriminating integer invariant
        # (at the default 45-degree sun nothing shadows).
        hsrows.append({
            "dem_id": f"dem_{k}",
            "n_cells": int(slope.size // (TILE * TILE)),
            "mean_shade": half_up(float(sh.sum()) / sh.size, 4),
            "n_shadow_low": int((low == 0.0).sum()),
        })
    pd.DataFrame(hsrows).to_parquet(
        f"{OUT}/expected_hillshade.parquet", index=False)

    # TPI landform classes: full-grid center-minus-3x3-mean (same
    # pad_extrapolate + conv3 term order as the engine's halo path),
    # classified on the f32 cast -- counts are exact integers.
    # Asymmetric thresholds (ridge > 0.02, valley < -0.01): the convex
    # gaussian-hill fixture skews TPI positive; dem_3 is all-flat.
    from terraspark.convolve import KERNEL_MEAN3, conv3 as _conv3
    from terraspark.kernels import pad_extrapolate as _padx
    trows = []
    for k in sorted(grids):
        z = grids[k].astype(np.float64)
        tpi = (z - _conv3(_padx(z), KERNEL_MEAN3)).astype(np.float32)
        n_ridge = int((tpi > 0.02).sum())
        n_valley = int((tpi < -0.01).sum())
        trows.append({
            "dem_id": f"dem_{k}",
            "n_cells": int(z.size // (TILE * TILE)),
            "n_ridge": n_ridge, "n_valley": n_valley,
            "n_flat": int(tpi.size - n_ridge - n_valley),
        })
    pd.DataFrame(trows).to_parquet(f"{OUT}/expected_tpi.parquet",
                                   index=False)

    # iso-contour crossing counts per (dem, level): full padded grid,
    # same pixel-owns-right+down-edge rule as the engine's halo path --
    # exact integer contour length in edge units
    from terraspark.convolve import contour_crossings
    LEVELS = (150.0, 300.0, 450.0)
    crows = []
    for k in sorted(grids):
        z = grids[k].astype(np.float64)
        stacked = contour_crossings(_padx(z), LEVELS)
        h = z.shape[0]
        for li, lv in enumerate(LEVELS):
            crows.append({
                "dem_id": f"dem_{k}", "level": lv,
                "n_crossings": int(stacked[li * h:(li + 1) * h].sum())})
    pd.DataFrame(crows).to_parquet(f"{OUT}/expected_contours.parquet",
                                   index=False)

    # affine warp: full-plane bilinear resample (warp.warp_plane shares
    # the sampling expression with the tiled engine), per-target-tile
    # f64 sums
    from terraspark.warp import WarpSpec, warp_plane
    spec = WarpSpec(h=384, w=704, ht=192, wt=320, oy=0.7, ox=0.3)
    wrows = []
    for k in sorted(grids):
        plane = warp_plane(grids[k], spec)
        assert not np.isnan(plane).any()
        for ty in range(spec.ht // TILE):
            for tx in range(spec.wt // TILE):
                blk = plane[ty * TILE:(ty + 1) * TILE,
                            tx * TILE:(tx + 1) * TILE]
                wrows.append({"dem_id": f"dem_{k}", "tile_x": tx,
                              "tile_y": ty,
                              "warp_sum": half_up(float(blk.sum()), 4)})
    pd.DataFrame(wrows).to_parquet(f"{OUT}/expected_warp.parquet",
                                   index=False)

    # ---------------- typed (dtype-lattice) fixture set: uint16/byte/int16
    # sources with per-type default NDV (SURVEY section 1.2)
    timages, tscenes, tdem, taoi, tgrids = build_tables(
        N_TYPED, fmt_of=typed_fmt)
    toracle = OracleRun(N_TYPED, timages, tscenes, tgrids, taoi)
    tsum = toracle.expected_correction_summary(round_to=10)
    tsum["mean_px"] = tsum["mean_px"].map(lambda v: half_up(v, 3))
    tsum.to_parquet(f"{OUT}/expected_typed_corrections.parquet", index=False)

    # final-cast roundtrip expectations: corrected cosine_t tiles cast back
    # to the INPUT dtype (independent numpy path through dtypes.cast_to_dtype
    # on the ORACLE's corrected arrays); crc32 summed per (image, band)
    import zlib
    fmt_by_img = dict(zip(timages["image_id"], timages["fmt"]))
    trows = []
    for _, r in timages.iterrows():
        iid = r["image_id"]
        gdal_t = dtypes.FMT_DTYPE[fmt_by_img[iid]]
        for b in range(BANDS):
            arr = toracle._corrected[iid]["cosine_t"][b]
            crc_sum, n_ndv = 0, 0
            for ty in range(IMG_H // TILE):
                for tx in range(IMG_W // TILE):
                    blk = arr[ty * TILE:(ty + 1) * TILE,
                              tx * TILE:(tx + 1) * TILE]
                    n_ndv += int(np.isnan(blk).sum())
                    typed = dtypes.cast_to_dtype(blk, gdal_t)
                    crc_sum += zlib.crc32(typed.tobytes()) & 0xFFFFFFFF
            trows.append({
                "image_id": iid, "band": b, "out_dtype": gdal_t,
                "ndv": float(dtypes.DEFAULT_NDV[gdal_t]),
                "n_ndv": n_ndv, "crc_sum": crc_sum,
            })
    pd.DataFrame(trows).to_parquet(f"{OUT}/expected_typed_roundtrip.parquet",
                                   index=False)
    # polyfill INPUT fixture: the aoi polygons (WKT) -- the img_polyfill
    # oracle recomputes the cover from these in pure SQL, so only the
    # INPUT is committed, not the expectation
    aoi[["aoi_id", "polygon"]].to_parquet(f"{OUT}/aoi_polygons.parquet",
                                          index=False)
    print("wrote expected tables to", OUT)


if __name__ == "__main__":
    main()
