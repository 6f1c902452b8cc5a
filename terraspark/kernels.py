"""Shared numpy kernels: terrain derivation + the 11 correction formulas.

This module is the single source of truth for the per-pixel math.  Both the
single-process reference model (terraspark.reference_model) and the Spark
engine (terraspark.corrections / terraspark.dem) call these functions, so
pixel-level parity between them tests the *distributed plumbing* (tiling,
halo exchange, joins, scalar aggregation) while the formulas themselves are
literal transcriptions of the reference plugin, cited per function.

Masked-divide semantics are reproduced exactly: the reference passes
``out=input_band.astype('float32')`` so pixels excluded by ``where=`` keep
the INPUT value inside the quotient (and are then multiplied by the input
again) -- e.g. Cosine-T yields DN*DN for below-threshold pixels.  We do not
"fix" this; the reference's output is the contract
(/root/reference/processing_alg/topocorrection/CosineTTopoCorrectionAlgorithm.py:38-47).
"""
from __future__ import annotations

import numpy as np

from .config import CorrectionParams, zero_noise

F32 = np.float32


# ======================================================================
# Terrain derivation (reference runs gdal:slope / gdal:aspect with
# ZEVENBERGEN=True, COMPUTE_EDGES=True, then deg2rad --
# execution_context.py:193-262).
# ======================================================================
def pad_extrapolate(z: np.ndarray) -> np.ndarray:
    """1-px linear-extrapolation pad (gdaldem COMPUTE_EDGES semantics:
    edge windows are filled with 2*edge - next, i.e. linear extrapolation)."""
    h, w = z.shape
    out = np.empty((h + 2, w + 2), dtype=z.dtype)
    out[1:-1, 1:-1] = z
    out[0, 1:-1] = 2 * z[0] - z[1]
    out[-1, 1:-1] = 2 * z[-1] - z[-2]
    out[:, 0] = 2 * out[:, 1] - out[:, 2]
    out[:, -1] = 2 * out[:, -2] - out[:, -3]
    return out


def zt_gradients(zpad: np.ndarray, pixel_size_m: float):
    """Zevenbergen-Thorne central differences on a 1-px-padded block.

    Returns (dz/dx eastward, dz/dy northward) for the unpadded interior.
    Matches gdal:slope/aspect ZEVENBERGEN (4-neighbor) stencils.
    """
    east = zpad[1:-1, 2:]
    west = zpad[1:-1, :-2]
    north = zpad[:-2, 1:-1]
    south = zpad[2:, 1:-1]
    dzdx = (east - west) / (2.0 * pixel_size_m)
    dzdy = (north - south) / (2.0 * pixel_size_m)
    return dzdx, dzdy


def slope_radians(zpad: np.ndarray, pixel_size_m: float) -> np.ndarray:
    """Slope in radians (gdal:slope ZEVENBERGEN degrees -> deg2rad,
    execution_context.py:193-227)."""
    dzdx, dzdy = zt_gradients(zpad, pixel_size_m)
    return np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy)).astype(F32)


def aspect_radians(zpad: np.ndarray, pixel_size_m: float) -> np.ndarray:
    """Aspect in radians, clockwise from north, ZERO_FLAT=True
    (gdal:aspect ZEVENBERGEN -> deg2rad, execution_context.py:229-262)."""
    dzdx, dzdy = zt_gradients(zpad, pixel_size_m)
    ang = np.degrees(np.arctan2(dzdy, -dzdx))
    az = np.where(ang > 90.0, 450.0 - ang, 90.0 - ang)
    az = np.where((dzdx == 0) & (dzdy == 0), 0.0, az)  # ZERO_FLAT
    return np.radians(az).astype(F32)


def luminance(slope_rad: np.ndarray, aspect_rad: np.ndarray,
              params: CorrectionParams) -> np.ndarray:
    """cos(i) illumination (execution_context.py:281-285):
    fmax(0, cos(sza)*cos(S) + sin(sza)*sin(S)*cos(A - azimuth))."""
    sza = params.sza_radians
    az = params.azimuth_radians
    out = np.fmax(
        0.0,
        np.cos(sza) * np.cos(slope_rad)
        + np.sin(sza) * np.sin(slope_rad) * np.cos(aspect_rad - az),
    )
    return out.astype(F32)


def hillshade(slope_rad: np.ndarray, aspect_rad: np.ndarray,
              azimuth_deg: float = 315.0,
              altitude_deg: float = 45.0) -> np.ndarray:
    """Cartographic hillshade (gdaldem hillshade shading equation):

        255 * max(0, cos(zen)*cos(S) + sin(zen)*sin(S)*cos(az - A))

    with zen = 90deg - sun altitude and the standard NW sun (315/45)
    defaults.  Same shading model as :func:`luminance` but with the
    cartographic sun and the 0..255 display scaling; kept in float64
    (no byte quantization) so shadow pixels (raw term <= 0) are exactly
    0.0 on both the tiled engine path and the full-grid oracle."""
    zen = np.radians(90.0 - altitude_deg)
    az = np.radians(azimuth_deg)
    s = slope_rad.astype(np.float64)
    a = aspect_rad.astype(np.float64)
    return 255.0 * np.fmax(
        0.0,
        np.cos(zen) * np.cos(s) + np.sin(zen) * np.sin(s) * np.cos(az - a))


# ======================================================================
# Sufficient statistics for the global per-(image, band) scalars.
# The reference computes these with whole-scene driver-side numpy
# (the scalability anti-pattern, SURVEY.md section 4); the engine
# computes the same closed forms from distributed partial sums.
# ======================================================================
STAT_FIELDS = (
    "n_reg", "sx_reg", "sy_reg", "sxx_reg", "sxy_reg",   # DN~L fit, mask DN>thr
    "n_min", "sx_min", "sy_min", "sxx_min", "sxy_min",   # Minnaert x~y fit, all px
    "n_all", "s_dn",                                      # band mean (VECA/Teillet)
    "s_lum", "n_lum",                                     # luminance mean (Cosine-C)
)


def minnaert_xy(dn: np.ndarray, lum: np.ndarray, slope_rad: np.ndarray):
    """Minnaert regression variables (MinnaertTopoCorrectionAlgorithm.py:74-108):
    x = ln(cos(S)*L)  where L>0   else -10
    y = ln(cos(S)*DN) where DN>0  else -10
    The -10 fill rows are INCLUDED in the fit (reference behavior)."""
    cs = np.cos(slope_rad)
    with np.errstate(invalid="ignore", divide="ignore"):
        x = np.log(cs * lum, out=np.full_like(slope_rad, -10.0, dtype=F32),
                   where=(lum > 0))
        y = np.log(cs * dn, out=np.full_like(slope_rad, -10.0, dtype=F32),
                   where=(dn > 0))
    return x, y


def partial_stats(dn: np.ndarray, lum: np.ndarray, slope_rad: np.ndarray,
                  params: CorrectionParams) -> dict[str, float]:
    """Per-tile partial sums; additive across tiles of one (image, band).

    Bandwidth notes (this is the hot half of the scalar-stats stage):
    masks are taken on the float32 inputs and subsets are INDEXED FIRST,
    CAST SECOND (4-byte reads instead of materializing full float64
    copies); the four second-moment products use BLAS dot (one pass, no
    elementwise temporary).  float32 -> float64 conversion is exact, so
    the only value drift vs the naive form is dot's blocked summation
    order -- orders of magnitude below the engine-vs-reference-model
    scalar difference that the rounded oracles already absorb."""
    dn32 = np.ascontiguousarray(dn).ravel()
    lum32 = np.ascontiguousarray(lum).ravel()
    valid = ~np.isnan(dn32)
    dnv = dn32[valid].astype(np.float64)
    lumv = lum32[valid].astype(np.float64)

    mask = dnv > params.pixel_ignore_threshold   # regression sample filter
    if mask.all():                               # common case: no copy
        x, y = lumv, dnv
    else:
        x, y = lumv[mask], dnv[mask]

    mx32, my32 = minnaert_xy(dn32, lum32,
                             np.ascontiguousarray(slope_rad).ravel())
    mx = mx32[valid].astype(np.float64)
    my = my32[valid].astype(np.float64)

    return {
        "n_reg": float(x.size), "sx_reg": float(x.sum()), "sy_reg": float(y.sum()),
        "sxx_reg": float(x @ x), "sxy_reg": float(x @ y),
        "n_min": float(mx.size), "sx_min": float(mx.sum()), "sy_min": float(my.sum()),
        "sxx_min": float(mx @ mx), "sxy_min": float(mx @ my),
        "n_all": float(dnv.size), "s_dn": float(dnv.sum()),
        # luminance mean is over the WHOLE scene raster, not masked by DN
        # validity (CosineCTopoCorrectionAlgorithm.py:42 reads
        # ctx.luminance_bytes directly)
        "s_lum": float(np.sum(lum32, dtype=np.float64)),
        "n_lum": float(lum32.size),
    }


def partial_stats_tiles(dn: np.ndarray, lum: np.ndarray,
                        slope_rad: np.ndarray,
                        params: CorrectionParams) -> dict[str, np.ndarray]:
    """PER-TILE partial sums, one output element per tile row: the
    partition-invariance building block of the scalar stage.

    Unlike per-batch-group partials, a tile's partial depends ONLY on that
    tile's 4096 pixels (fixed-length axis-1 reductions, masked via
    where-zeros), so its value is identical no matter how the scan batched
    or partitioned the rows.  corrections._stats_agg then folds the tile
    partials in canonical (tile_y, tile_x) order JVM-side, making the
    scalar regressions BIT-DETERMINISTIC across any parallelism level --
    load-bearing because veca/teillet denominators cross zero inside
    ill-conditioned scenes, where even one-ulp scalar differences flip
    their where-masks and visibly move cell statistics (the 4-core vs
    8-core divergence this design removes; test_scalar_parity
    ::test_stats_partition_invariant)."""
    n = dn.shape[0]
    dn2 = np.ascontiguousarray(dn).reshape(n, -1)
    lum2 = np.ascontiguousarray(lum).reshape(n, -1)
    slope2 = np.ascontiguousarray(slope_rad).reshape(n, -1)
    p = dn2.shape[1]

    valid = ~np.isnan(dn2)
    with np.errstate(invalid="ignore"):
        rmask = dn2 > params.pixel_ignore_threshold   # NaN -> False
    z32 = np.float32(0.0)
    # masked operands stay FLOAT32; every reduction below accumulates in
    # float64 on the fly (sum dtype= / einsum dtype= use numpy's buffered
    # iteration) -- no full float64 mirrors, half the memory traffic of
    # the naive cast-then-reduce form.  float32 -> float64 element
    # conversion is exact, and the reductions are shape-deterministic,
    # which is all the canonical fold needs.
    xl = np.where(rmask, lum2, z32)
    yd = np.where(rmask, dn2, z32)
    dnz = np.where(valid, dn2, z32)

    mx32, my32 = minnaert_xy(dn2.ravel(), lum2.ravel(), slope2.ravel())
    mxz = np.where(valid, mx32.reshape(n, p), z32)
    myz = np.where(valid, my32.reshape(n, p), z32)

    fsum = lambda a: a.sum(axis=1, dtype=np.float64)
    dot = lambda a, b: np.einsum("ij,ij->i", a, b, dtype=np.float64)
    nv = valid.sum(axis=1).astype(np.float64)
    return {
        "n_reg": rmask.sum(axis=1).astype(np.float64),
        "sx_reg": fsum(xl), "sy_reg": fsum(yd),
        "sxx_reg": dot(xl, xl), "sxy_reg": dot(xl, yd),
        "n_min": nv, "sx_min": fsum(mxz), "sy_min": fsum(myz),
        "sxx_min": dot(mxz, mxz), "sxy_min": dot(mxz, myz),
        "n_all": nv, "s_dn": fsum(dnz),
        # luminance mean is over the WHOLE raster (not DN-masked)
        "s_lum": lum2.sum(axis=1, dtype=np.float64),
        "n_lum": np.full(n, float(p)),
    }


def ols_from_sums(n: float, sx: float, sy: float, sxx: float, sxy: float):
    """Closed-form OLS deg-1 fit == np.polynomial.polynomial.polyfit(x,y,1)
    (intercept, slope), from sufficient statistics."""
    denom = n * sxx - sx * sx
    if n == 0 or denom == 0:
        return float("nan"), float("nan")
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    return intercept, slope


def scalars_from_stats(stats: dict[str, float]) -> dict[str, float]:
    """All method scalars from one stats bundle for one (image, band).

    c   = intercept/slope of DN~L        (CTopoCorrectionAlgorithm.py:60-62)
    k   = slope of Minnaert y~x          (MinnaertTopoCorrectionAlgorithm.py:70-73,110-115)
    pbc_c = slope/intercept of Minnaert fit (PbcTopoCorrectionAlgorithm.py:80-83 --
            note INVERTED ratio vs C-correction)
    band_mean, lum_mean                  (VecaTopoCorrectionAlgorithm.py:39;
                                          CosineCTopoCorrectionAlgorithm.py:42)
    """
    ri, rs = ols_from_sums(stats["n_reg"], stats["sx_reg"], stats["sy_reg"],
                           stats["sxx_reg"], stats["sxy_reg"])
    mi, ms = ols_from_sums(stats["n_min"], stats["sx_min"], stats["sy_min"],
                           stats["sxx_min"], stats["sxy_min"])
    return {
        "reg_intercept": ri,
        "reg_slope": rs,
        "c": ri / rs if rs else float("nan"),
        "k": ms,
        "pbc_c": ms / mi if mi else float("nan"),
        "band_mean": stats["s_dn"] / stats["n_all"] if stats["n_all"] else float("nan"),
        "lum_mean": stats["s_lum"] / stats["n_lum"] if stats["n_lum"] else float("nan"),
    }


# ======================================================================
# The 11 correction kernels.  dn/lum/slope_rad are float arrays of equal
# shape; scalars is the dict from scalars_from_stats; returns float32.
# ======================================================================
def _out_buf(dn: np.ndarray) -> np.ndarray:
    return dn.astype("float32")


def cosine_t(dn, lum, slope_rad, sc, params: CorrectionParams, eps):
    # CosineTTopoCorrectionAlgorithm.py:38-47
    with np.errstate(all="ignore"):
        return dn * np.divide(
            params.sza_cosine, lum, out=_out_buf(dn),
            where=np.logical_and(lum > 0, dn > params.pixel_ignore_threshold),
        )


def cosine_c(dn, lum, slope_rad, sc, params: CorrectionParams, eps):
    # CosineCTopoCorrectionAlgorithm.py:44-53
    lm = sc["lum_mean"]
    with np.errstate(all="ignore"):
        return dn * (1 + np.divide(
            lm - lum, lm, out=_out_buf(dn),
            where=dn > params.pixel_ignore_threshold,
        ))


def c_correction(dn, lum, slope_rad, sc, params: CorrectionParams, eps):
    # CTopoCorrectionAlgorithm.py:27-33 -- NOTE: no where-guard on the divide;
    # inf/nan for denominator 0 is reference behavior, reproduced not fixed.
    c = sc["c"]
    denominator = lum + c
    with np.errstate(all="ignore"):
        return dn * np.divide(params.sza_cosine + c, denominator, _out_buf(dn))


def scs(dn, lum, slope_rad, sc, params: CorrectionParams, eps):
    # ScsTopoCorrectionAlgorithm.py:38-47
    with np.errstate(all="ignore"):
        return dn * np.divide(
            np.cos(slope_rad) * params.sza_cosine, lum, out=_out_buf(dn),
            where=np.logical_and(lum > 0, dn > params.pixel_ignore_threshold),
        )


def scs_c(dn, lum, slope_rad, sc, params: CorrectionParams, eps):
    # ScsCTopoCorrectionAlgorithm.py:39-50
    c = sc["c"]
    denominator = lum + c
    with np.errstate(all="ignore"):
        return dn * np.divide(
            np.cos(slope_rad) * params.sza_cosine + c, denominator,
            out=_out_buf(dn),
            where=np.logical_and(denominator > 0,
                                 dn > params.pixel_ignore_threshold),
        )


def minnaert(dn, lum, slope_rad, sc, params: CorrectionParams, eps):
    # MinnaertTopoCorrectionAlgorithm.py:50-60
    k = sc["k"]
    with np.errstate(all="ignore"):
        quotient = np.divide(
            params.sza_cosine, lum, out=_out_buf(dn),
            where=np.logical_and(lum > 0, dn > params.pixel_ignore_threshold),
        )
        return dn * np.power(quotient, k)


def minnaert_scs(dn, lum, slope_rad, sc, params: CorrectionParams, eps):
    # MinnaertScsTopoCorrectionAlgorithm.py:39-48
    k = sc["k"]
    with np.errstate(all="ignore"):
        quotient = np.divide(
            params.sza_cosine, lum, out=_out_buf(dn),
            where=np.logical_and(lum > 0, dn > params.pixel_ignore_threshold),
        )
        return dn * np.cos(slope_rad) * np.power(quotient, k)


def pbm(dn, lum, slope_rad, sc, params: CorrectionParams, eps):
    # PbmTopoCorrectionAlgorithm.py:38-49
    k = sc["k"]
    with np.errstate(all="ignore"):
        slope_cos = np.cos(slope_rad)
        return dn * np.divide(
            slope_cos, np.power(slope_cos * lum, k), out=_out_buf(dn),
            where=np.logical_and(lum > 0, dn > params.pixel_ignore_threshold),
        )


def veca(dn, lum, slope_rad, sc, params: CorrectionParams, eps):
    # VecaTopoCorrectionAlgorithm.py:43-53
    intercept, slope = sc["reg_intercept"], sc["reg_slope"]
    denominator = slope * lum + intercept
    with np.errstate(all="ignore"):
        result = dn * np.divide(
            sc["band_mean"], denominator, out=_out_buf(dn),
            where=np.logical_and(denominator > 0,
                                 dn > params.pixel_ignore_threshold),
        )
    result[result <= 0] = eps
    return result


def teillet(dn, lum, slope_rad, sc, params: CorrectionParams, eps):
    # TeilletRegressionTopoCorrectionAlgorithm.py:48-57
    intercept, slope = sc["reg_intercept"], sc["reg_slope"]
    with np.errstate(all="ignore"):
        result = np.add(
            dn - slope * lum - intercept, sc["band_mean"], out=_out_buf(dn),
            where=dn > params.pixel_ignore_threshold,
        )
    result[result <= 0] = eps
    return result


def pbc(dn, lum, slope_rad, sc, params: CorrectionParams, eps):
    # PbcTopoCorrectionAlgorithm.py:46-58; h raster = (1-S)/pi (:46-47),
    # h0 = (pi + 2*azimuth_rad)/(2*pi) (:49), c = slope/intercept (:80-83)
    c = sc["pbc_c"]
    h0 = params.pbc_h0
    h = (1.0 - slope_rad) / np.pi
    denominator = lum + c * h / h0
    with np.errstate(all="ignore"):
        return dn * np.divide(
            params.sza_cosine + c / h0, denominator, out=_out_buf(dn),
            where=np.logical_and(denominator > 0,
                                 dn > params.pixel_ignore_threshold),
        )


KERNELS = {
    "cosine_t": cosine_t,
    "cosine_c": cosine_c,
    "c_correction": c_correction,
    "scs": scs,
    "scs_c": scs_c,
    "minnaert": minnaert,
    "minnaert_scs": minnaert_scs,
    "pbm": pbm,
    "veca": veca,
    "teillet": teillet,
    "pbc": pbc,
}


def apply_correction(method: str, image_id: str, band: int,
                     dn: np.ndarray, lum: np.ndarray, slope_rad: np.ndarray,
                     scalars: dict[str, float],
                     params: CorrectionParams,
                     ndv: np.ndarray | None = None) -> np.ndarray:
    """Run one correction kernel with NDV propagation (any NaN input pixel
    -> NaN output, raster_calc.py:256-274).

    ``ndv`` optionally passes the precomputed ``isnan(dn)`` mask so callers
    running all 11 methods over one group (corrections._correct_batches)
    scan the input once instead of per method.  ``np.asarray`` casts are
    no-copy when the inputs are already float32 (tiling.tiles_as_numpy
    views); kernels never write into their inputs, so sharing the buffers
    across methods is safe.
    """
    eps = zero_noise(image_id, band, method)
    dn32 = np.asarray(dn, dtype=F32)
    out = KERNELS[method](dn32, np.asarray(lum, dtype=F32),
                          np.asarray(slope_rad, dtype=F32),
                          scalars, params, eps)
    if ndv is None:
        ndv = np.isnan(dn32)
    if ndv.any():
        out = out.copy()
        out[ndv] = np.nan
    return out.astype(F32)
