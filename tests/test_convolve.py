"""convolve_tiles: tile-parallel halo convolution == whole-plane conv,
bit-for-bit, including NaN spread and gdaldem-style border extrapolation.
"""
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from terraspark.config import TILE
from terraspark.convolve import KERNEL_GAUSS3, conv3, convolve_tiles
from terraspark.kernels import pad_extrapolate


def _tiles_df(spark, plane, nx, ny):
    rows = []
    for ty in range(ny):
        for tx in range(nx):
            blk = np.ascontiguousarray(
                plane[ty * TILE:(ty + 1) * TILE, tx * TILE:(tx + 1) * TILE])
            rows.append({"image_id": "im", "band": 0, "tile_x": tx,
                         "tile_y": ty, "px": blk.astype("<f4").tobytes()})
    return spark.createDataFrame(
        pd.DataFrame(rows),
        "image_id string, band int, tile_x int, tile_y int, px binary")


def test_halo_convolution_equals_whole_plane(spark):
    rng = np.random.default_rng(3)
    nx, ny = 4, 3
    plane = rng.normal(100.0, 25.0, (ny * TILE, nx * TILE)) \
        .astype(np.float32)
    plane[rng.random(plane.shape) < 0.01] = np.nan
    got = convolve_tiles(_tiles_df(spark, plane, nx, ny)).toPandas()
    assert len(got) == nx * ny

    want = conv3(pad_extrapolate(plane.astype(np.float64)), KERNEL_GAUSS3)
    for r in got.itertuples(index=False):
        g = np.frombuffer(r.conv, dtype="<f4").reshape(TILE, TILE)
        w = want[r.tile_y * TILE:(r.tile_y + 1) * TILE,
                 r.tile_x * TILE:(r.tile_x + 1) * TILE]
        # f64 audit sum must be bit-equal to the plane-level slice sum
        assert r.conv_sum == float(np.nansum(w)), (r.tile_x, r.tile_y)
        assert r.n_nan == int(np.isnan(w).sum())
        # the f32 tile itself: exact cast of the identical f64 values
        both_nan = np.isnan(g) & np.isnan(w)
        assert np.array_equal(g[~both_nan], w[~both_nan].astype(np.float32))
        assert np.array_equal(np.isnan(g), np.isnan(w))


def test_kernel_shape_guard(spark):
    import pytest
    with pytest.raises(ValueError):
        convolve_tiles(_tiles_df(spark, np.zeros(
            (TILE, TILE), np.float32), 1, 1), kernel=np.ones((5, 5)))


def test_morphology_equals_whole_plane(spark):
    from terraspark.convolve import morph3, morph_tiles
    rng = np.random.default_rng(9)
    nx, ny = 3, 2
    plane = rng.uniform(0, 255, (ny * TILE, nx * TILE)).astype(np.float32)
    got = morph_tiles(_tiles_df(spark, plane, nx, ny), op="erode").toPandas()
    want = morph3(pad_extrapolate(plane.astype(np.float64)), "erode")
    assert len(got) == nx * ny
    for r in got.itertuples(index=False):
        w = want[r.tile_y * TILE:(r.tile_y + 1) * TILE,
                 r.tile_x * TILE:(r.tile_x + 1) * TILE]
        assert r.conv_sum == float(np.nansum(w))
    # dilate >= identity >= erode, everywhere
    dil = morph3(pad_extrapolate(plane.astype(np.float64)), "dilate")
    assert (dil >= plane - 1e-12).all() and (want <= plane + 1e-12).all()


def test_resample_equals_whole_plane_and_interpolates(spark):
    from terraspark.convolve import bilinear2x, resample_tiles
    rng = np.random.default_rng(21)
    nx, ny = 3, 2
    plane = rng.normal(50.0, 10.0, (ny * TILE, nx * TILE)).astype(np.float32)
    got = resample_tiles(_tiles_df(spark, plane, nx, ny)).toPandas()
    up = bilinear2x(pad_extrapolate(plane.astype(np.float64)))
    assert up.shape == (2 * ny * TILE, 2 * nx * TILE)
    for r in got.itertuples(index=False):
        g = np.frombuffer(r.conv, dtype="<f4").reshape(2 * TILE, 2 * TILE)
        w = up[r.tile_y * 2 * TILE:(r.tile_y + 1) * 2 * TILE,
               r.tile_x * 2 * TILE:(r.tile_x + 1) * 2 * TILE]
        assert r.conv_sum == float(np.nansum(w)), (r.tile_x, r.tile_y)
        assert np.array_equal(g, w.astype(np.float32))
    # interpolation sanity: odd/even samples straddle the input values
    # (interior pixel: out[2i+1, 2j+1] is a convex combination)
    assert abs(up.mean() - plane.astype(np.float64).mean()) < 0.05
