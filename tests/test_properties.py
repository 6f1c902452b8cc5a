"""Property-based tests (hypothesis) for the pure-numpy foundations."""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from terraspark import cells, codecs
from terraspark.config import DEFAULT_PARAMS
from terraspark.kernels import (ols_from_sums, pad_extrapolate,
                                partial_stats, slope_radians, luminance,
                                aspect_radians, STAT_FIELDS)

lat_s = st.floats(min_value=-85, max_value=85, allow_nan=False)
lon_s = st.floats(min_value=-175, max_value=175, allow_nan=False)
res_s = st.integers(min_value=0, max_value=12)


@given(lat_s, lon_s, res_s)
@settings(max_examples=200, deadline=None)
def test_cell_encode_center_fixpoint(lat, lon, res):
    c = int(cells.encode(lat, lon, res))
    clat, clon = cells.cell_center(c)
    assert int(cells.encode(float(clat), float(clon), res)) == c
    # point is inside its cell
    size = cells.cell_size_deg(res)
    assert abs(float(clat) - lat) <= size
    assert abs(float(clon) - lon) <= size


@given(lat_s, lon_s, st.integers(min_value=1, max_value=3))
@settings(max_examples=50, deadline=None)
def test_ring_symmetry(lat, lon, k):
    """b in ring(a, k)  <=>  a in ring(b, k)."""
    a = int(cells.encode(lat, lon, 7))
    ring_a = set(int(x) for x in cells.ring(a, k))
    for b in list(ring_a)[:5]:
        assert a in set(int(x) for x in cells.ring(b, k))


@given(st.integers(min_value=0, max_value=2**31), st.integers(1, 8),
       st.integers(8, 32))
@settings(max_examples=30, deadline=None)
def test_raw_codec_roundtrip(seed, bands, hw):
    rng = np.random.default_rng(seed)
    px = rng.uniform(-1e6, 1e6, (bands, hw, hw)).astype(np.float32)
    out = codecs.decode(codecs.encode(px, "raw_f32"), "raw_f32",
                        bands, hw, hw)
    assert np.array_equal(px, out)


@given(st.integers(min_value=0, max_value=2**31))
@settings(max_examples=30, deadline=None)
def test_png_codec_roundtrip(seed):
    rng = np.random.default_rng(seed)
    px = np.rint(rng.uniform(0, 65535, (2, 16, 16))).astype(np.float32)
    out = codecs.decode(codecs.encode(px, "png"), "png", 2, 16, 16)
    assert np.array_equal(px, out)


@given(st.integers(min_value=0, max_value=2**31), st.integers(2, 5))
@settings(max_examples=30, deadline=None)
def test_partial_stats_additivity(seed, parts):
    """Chunked partial sums == whole-array sums (exact distributivity of
    the sufficient-statistics aggregation)."""
    rng = np.random.default_rng(seed)
    n = parts * 64
    dn = rng.uniform(0, 500, n).astype(np.float32)
    lum = rng.uniform(0.01, 1, n).astype(np.float32)
    sl = rng.uniform(0, 1.0, n).astype(np.float32)
    whole = partial_stats(dn, lum, sl, DEFAULT_PARAMS)
    acc = {f: 0.0 for f in STAT_FIELDS}
    for i in range(parts):
        s = partial_stats(dn[i * 64:(i + 1) * 64], lum[i * 64:(i + 1) * 64],
                          sl[i * 64:(i + 1) * 64], DEFAULT_PARAMS)
        for f in STAT_FIELDS:
            acc[f] += s[f]
    for f in STAT_FIELDS:
        assert np.isclose(acc[f], whole[f], rtol=1e-9), f


@given(st.integers(min_value=0, max_value=2**31))
@settings(max_examples=30, deadline=None)
def test_ols_matches_polyfit_prop(seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-10, 10, 500)
    y = rng.uniform(-3, 3) * x + rng.uniform(-5, 5) \
        + rng.normal(0, 0.5, 500)
    i1, s1 = ols_from_sums(len(x), x.sum(), y.sum(), (x * x).sum(),
                           (x * y).sum())
    i2, s2 = np.polynomial.polynomial.polyfit(x, y, 1)
    assert np.isclose(i1, i2, rtol=1e-6, atol=1e-9)
    assert np.isclose(s1, s2, rtol=1e-6, atol=1e-9)


@given(st.integers(min_value=0, max_value=2**31))
@settings(max_examples=20, deadline=None)
def test_luminance_bounds(seed):
    rng = np.random.default_rng(seed)
    z = rng.uniform(0, 1000, (16, 16))
    zp = pad_extrapolate(z)
    s = slope_radians(zp, 10.0)
    a = aspect_radians(zp, 10.0)
    lum = luminance(s, a, DEFAULT_PARAMS)
    assert (lum >= 0).all() and (lum <= 1.0 + 1e-6).all()
    assert (s >= 0).all() and (s < np.pi / 2).all()
    assert (a >= 0).all() and (a < 2 * np.pi + 1e-6).all()
