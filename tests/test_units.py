"""Unit tests: codecs, cell index, kernels, DEM halo assembly, sufficient
stats vs polyfit."""
import numpy as np
import pandas as pd
import pytest

from terraspark import cells, codecs
from terraspark.config import DEFAULT_PARAMS, METHODS, TILE, zero_noise
from terraspark.dem import assemble_padded
from terraspark.kernels import (apply_correction, ols_from_sums,
                                pad_extrapolate, partial_stats,
                                scalars_from_stats, slope_radians,
                                aspect_radians, luminance, STAT_FIELDS)

rng = np.random.default_rng(7)


# ------------------------------------------------------------------ codecs
@pytest.mark.parametrize("fmt,gen", [
    ("raw_f32", lambda: rng.uniform(0, 1000, (4, 128, 128)).astype(np.float32)),
    ("png", lambda: np.rint(rng.uniform(0, 10000, (4, 128, 128))).astype(np.float32)),
])
def test_codec_lossless(fmt, gen):
    px = gen()
    out = codecs.decode(codecs.encode(px, fmt), fmt, 4, 128, 128)
    assert np.array_equal(px, out)


def test_raw_nan_roundtrip():
    px = rng.uniform(0, 10, (1, 8, 8)).astype(np.float32)
    px[0, 2, 3] = np.nan
    out = codecs.decode(codecs.encode(px, "raw_f32"), "raw_f32", 1, 8, 8)
    assert np.isnan(out[0, 2, 3]) and np.array_equal(
        px[~np.isnan(px)], out[~np.isnan(out)])


def test_jpeg_stub_lossy_but_40db():
    px = rng.uniform(0, 255, (4, 128, 128)).astype(np.float32)
    out = codecs.decode(codecs.encode(px, "jpeg"), "jpeg", 4, 128, 128)
    assert not np.array_equal(px, out)          # genuinely lossy
    assert codecs.psnr(px, out) >= 40.0


def test_dhash_deterministic_and_sensitive():
    px = rng.uniform(0, 255, (1, 64, 64)).astype(np.float32)
    h1 = codecs.dhash64(px)
    assert h1 == codecs.dhash64(px.copy())
    px2 = px.copy()
    px2[0, :, :32] += 500     # left half brighter -> horizontal diffs flip
    assert codecs.dhash64(px2) != h1


# ------------------------------------------------------------------- cells
def test_cell_roundtrip_vectorized():
    lats = rng.uniform(-89, 89, 1000)
    lons = rng.uniform(-179, 179, 1000)
    keys = cells.encode(lats, lons, 7)
    clat, clon = cells.cell_center(keys)
    assert np.array_equal(cells.encode(clat, clon, 7), keys)
    size = cells.cell_size_deg(7)
    assert np.abs(clat - lats).max() <= size
    assert np.abs(clon - lons).max() <= size


def test_ring_counts():
    c = int(cells.encode(40.0, -105.0, 7))
    assert len(cells.ring(c, 1)) == 9
    assert len(cells.ring(c, 2)) == 25
    assert len(cells.ring(c, 1, include_center=False)) == 8


def test_cover_wkt_triangle():
    # triangle should cover fewer cells than its bbox
    tri = "POLYGON((-105.0 40.0, -104.9 40.0, -105.0 40.1, -105.0 40.0))"
    bbox = cells.cover_bbox(40.0, 40.1, -105.0, -104.9, 7)
    cov = cells.cover_wkt(tri, 7)
    assert 0 < len(cov) < len(bbox)
    assert set(cov) <= set(bbox)


# ----------------------------------------------------------------- kernels
def test_ols_matches_polyfit():
    x = rng.uniform(0, 1, 5000)
    y = 3.5 * x + 2.0 + rng.normal(0, 0.1, 5000)
    n, sx, sy = len(x), x.sum(), y.sum()
    sxx, sxy = (x * x).sum(), (x * y).sum()
    i1, s1 = ols_from_sums(n, sx, sy, sxx, sxy)
    i2, s2 = np.polynomial.polynomial.polyfit(x, y, 1)
    assert abs(i1 - i2) < 1e-9 and abs(s1 - s2) < 1e-9


def test_partial_stats_additive():
    """Sum of per-tile partials == whole-array stats (exact distributivity)."""
    dn = rng.uniform(0, 500, (2, TILE, TILE)).astype(np.float32)
    lum = rng.uniform(0.1, 1, (2, TILE, TILE)).astype(np.float32)
    slope = rng.uniform(0, 0.5, (2, TILE, TILE)).astype(np.float32)
    whole = partial_stats(dn, lum, slope, DEFAULT_PARAMS)
    parts = [partial_stats(dn[i], lum[i], slope[i], DEFAULT_PARAMS)
             for i in range(2)]
    for f in STAT_FIELDS:
        assert np.isclose(whole[f], parts[0][f] + parts[1][f], rtol=1e-12), f


def test_cosine_t_unmasked_is_dn_squared():
    """Bug-compatible masked-divide semantics: below-threshold pixels get
    DN * DN (out buffer keeps the input where the mask is False)."""
    dn = np.array([[2.0, 100.0]], dtype=np.float32)   # 2 <= threshold 5
    lum = np.array([[0.5, 0.5]], dtype=np.float32)
    slope = np.zeros_like(dn)
    sc = scalars_from_stats(partial_stats(dn, lum, slope, DEFAULT_PARAMS))
    out = apply_correction("cosine_t", "img", 0, dn, lum, slope, sc,
                           DEFAULT_PARAMS)
    assert out[0, 0] == pytest.approx(4.0)            # DN*DN
    assert out[0, 1] == pytest.approx(100.0 * DEFAULT_PARAMS.sza_cosine / 0.5,
                                      rel=1e-6)


def test_zero_noise_deterministic_range():
    e = zero_noise("img_000001", 2, "veca")
    assert e == zero_noise("img_000001", 2, "veca")
    assert 0.0001 < e <= 0.0001 + 0.000001 * 99
    assert e != zero_noise("img_000001", 2, "teillet")


def test_ndv_propagation():
    dn = np.array([[100.0, np.nan, 150.0, 120.0]], dtype=np.float32)
    lum = np.array([[0.8, 0.7, 0.9, 0.75]], dtype=np.float32)
    slope = np.array([[0.1, 0.2, 0.15, 0.12]], dtype=np.float32)
    sc = scalars_from_stats(partial_stats(dn, lum, slope, DEFAULT_PARAMS))
    for m in METHODS:
        out = apply_correction(m, "i", 0, dn, lum, slope, sc, DEFAULT_PARAMS)
        assert np.isnan(out[0, 1]), m
        assert np.isfinite(out[0, 0]), m


# ----------------------------------------------------- halo assembly == pad
def test_halo_assembly_matches_full_grid():
    """Tile-wise assembly with strips (interior) and extrapolation
    (borders) must equal pad_extrapolate on the full grid."""
    t = 8
    grid = rng.uniform(0, 100, (3 * t, 3 * t)).astype(np.float64)
    full = pad_extrapolate(grid)
    for ty in range(3):
        for tx in range(3):
            z = grid[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t]
            strips = {}
            if ty > 0:
                strips["N"] = grid[ty * t - 1, tx * t:(tx + 1) * t]
            if ty < 2:
                strips["S"] = grid[(ty + 1) * t, tx * t:(tx + 1) * t]
            if tx > 0:
                strips["W"] = grid[ty * t:(ty + 1) * t, tx * t - 1]
            if tx < 2:
                strips["E"] = grid[ty * t:(ty + 1) * t, (tx + 1) * t]
            if ty > 0 and tx > 0:
                strips["NW"] = grid[ty * t - 1, tx * t - 1:tx * t]
            if ty > 0 and tx < 2:
                strips["NE"] = grid[ty * t - 1, (tx + 1) * t:(tx + 1) * t + 1]
            if ty < 2 and tx > 0:
                strips["SW"] = grid[(ty + 1) * t, tx * t - 1:tx * t]
            if ty < 2 and tx < 2:
                strips["SE"] = grid[(ty + 1) * t, (tx + 1) * t:(tx + 1) * t + 1]
            zp = assemble_padded(z, strips, t)
            want = full[ty * t:(ty + 1) * t + 2, tx * t:(tx + 1) * t + 2]
            assert np.allclose(zp, want, atol=1e-12), (ty, tx)


def test_terrain_flat_zero_flat():
    z = np.full((10, 10), 100.0)
    zp = pad_extrapolate(z)
    s = slope_radians(zp, 10.0)
    a = aspect_radians(zp, 10.0)
    assert np.all(s == 0) and np.all(a == 0)          # ZERO_FLAT
    lum = luminance(s, a, DEFAULT_PARAMS)
    assert np.allclose(lum, DEFAULT_PARAMS.sza_cosine, atol=1e-7)


def test_hillshade_flat_and_shadow():
    from terraspark.kernels import hillshade
    # flat terrain under a 45-degree sun: shade = 255*cos(45) everywhere
    s = np.zeros((4, 4), dtype=np.float32)
    a = np.zeros((4, 4), dtype=np.float32)
    sh = hillshade(s, a)
    assert sh.dtype == np.float64
    assert np.allclose(sh, 255.0 * np.cos(np.radians(45.0)), atol=1e-9)
    # a 60-degree slope facing SE (aspect 135) under the default NW sun
    # points away harder than the sun altitude: exact 0 (clamped shadow)
    s60 = np.full((2, 2), np.radians(60.0), dtype=np.float32)
    a135 = np.full((2, 2), np.radians(135.0), dtype=np.float32)
    assert np.all(hillshade(s60, a135) == 0.0)
    # same slope facing the sun (aspect 315) is the brightest case
    a315 = np.full((2, 2), np.radians(315.0), dtype=np.float32)
    bright = hillshade(s60, a315)
    expected = 255.0 * (np.cos(np.radians(45)) * np.cos(np.radians(60))
                        + np.sin(np.radians(45)) * np.sin(np.radians(60)))
    assert np.allclose(bright, expected, atol=1e-6)


def test_tpi3_signs_and_flat():
    from terraspark.convolve import tpi3
    from terraspark.kernels import pad_extrapolate
    # constant slope: every pixel equals its 3x3 mean -> TPI exactly 0
    z = np.outer(np.arange(8, dtype=np.float64), np.ones(8)) * 3.0
    tpi = tpi3(pad_extrapolate(z))
    assert np.allclose(tpi, 0.0, atol=1e-12)
    # a single spike is locally high (positive), its neighbors locally
    # low-ish; the spike pixel's TPI is value - mean = 9 - 1 = 8
    z2 = np.zeros((8, 8))
    z2[4, 4] = 9.0
    tpi2 = tpi3(pad_extrapolate(z2))
    assert abs(tpi2[4, 4] - 8.0) < 1e-12
    assert tpi2[4, 3] < 0          # neighbor pulled below its local mean


def test_contour_crossings_hand_case_and_tile_sum():
    from terraspark.convolve import contour_crossings
    from terraspark.kernels import pad_extrapolate
    # step grid: left half 0, right half 10 -> level 5 crosses once per
    # row on the vertical boundary edge; no horizontal crossings
    z = np.zeros((6, 6))
    z[:, 3:] = 10.0
    st = contour_crossings(pad_extrapolate(z), (5.0,))
    assert st.shape == (6, 6)
    assert st.sum() == 6.0                      # one crossing per row
    assert np.all(st[:, 2] == 1.0)              # owned by the left pixel
    # stacked multi-level: level 15 never crosses
    st2 = contour_crossings(pad_extrapolate(z), (5.0, 15.0))
    assert st2.shape == (12, 6)
    assert st2[:6].sum() == 6.0 and st2[6:].sum() == 0.0
    # tile-splitting exactness: sum over 4 quadrant tiles with true
    # neighbor halos == full-grid count (random-ish smooth surface)
    yy, xx = np.mgrid[0:8, 0:8].astype(np.float64)
    g = np.sin(xx / 2.0) * 3.0 + np.cos(yy / 3.0) * 2.0
    full = contour_crossings(pad_extrapolate(g), (0.5,)).sum()
    gp = pad_extrapolate(g)
    tot = 0.0
    for ty in range(2):
        for tx in range(2):
            zp = gp[ty * 4:ty * 4 + 6, tx * 4:tx * 4 + 6]
            tot += contour_crossings(zp, (0.5,)).sum()
    assert tot == full
