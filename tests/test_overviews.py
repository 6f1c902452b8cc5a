"""Overview pyramid: tiled build == whole-plane numpy model (bit-exact
through the float32 storage), NoData box-mean semantics, missing-child
quadrants stay NaN."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from terraspark.config import TILE
from terraspark.overviews import overview_pyramid


def _tiles_df(spark, plane, image_id="img"):
    nty, ntx = plane.shape[0] // TILE, plane.shape[1] // TILE
    rows = []
    for ty in range(nty):
        for tx in range(ntx):
            blk = np.ascontiguousarray(
                plane[ty * TILE:(ty + 1) * TILE, tx * TILE:(tx + 1) * TILE],
                dtype="<f4")
            rows.append((image_id, 0, tx, ty, blk.tobytes()))
    return spark.createDataFrame(
        rows, "image_id string, band int, tile_x int, tile_y int, px binary")


def _plane_pyramid(plane, levels):
    out = {}
    p = plane.astype("<f4")
    for lvl in range(1, levels + 1):
        p64 = p.astype(np.float64)
        h = p64.shape[0] // 2
        blk = p64.reshape(h, 2, h, 2).transpose(0, 2, 1, 3).reshape(h, h, 4)
        with np.errstate(all="ignore"):
            down = np.nanmean(blk, axis=2)
        p = down.astype("<f4")
        out[lvl] = p.copy()
    return out


def test_tiled_equals_whole_plane(spark):
    rng = np.random.default_rng(3)
    plane = rng.normal(size=(256, 256)).astype(np.float32)
    plane[5:40, 7:33] = np.nan             # NoData hole
    got = overview_pyramid(_tiles_df(spark, plane), levels=2).collect()
    model = _plane_pyramid(plane, 2)
    for r in got:
        blk = np.frombuffer(r["px"], dtype="<f4").reshape(TILE, TILE)
        exp = model[r["level"]][r["tile_y"] * TILE:(r["tile_y"] + 1) * TILE,
                                r["tile_x"] * TILE:(r["tile_x"] + 1) * TILE]
        assert np.array_equal(blk[:exp.shape[0], :exp.shape[1]], exp,
                              equal_nan=True)
    lv1 = [r for r in got if r["level"] == 1]
    assert len(lv1) == 4 and all(r["n_valid"] <= TILE * TILE for r in lv1)


def test_nodata_box_mean_semantics(spark):
    plane = np.full((128, 128), 4.0, dtype=np.float32)
    plane[0, 0] = np.nan       # 2x2 block with one NaN -> mean of the 3
    plane[0, 2] = plane[0, 3] = plane[1, 2] = plane[1, 3] = np.nan
    got = overview_pyramid(_tiles_df(spark, plane), levels=1).collect()
    assert len(got) == 1
    blk = np.frombuffer(got[0]["px"], dtype="<f4").reshape(TILE, TILE)
    assert blk[0, 0] == 4.0            # partial block: NaN excluded
    assert np.isnan(blk[0, 1])         # fully-NaN block stays NoData
    assert got[0]["n_valid"] == TILE * TILE - 1


def test_missing_child_leaves_nan_quadrant(spark):
    # a single 64x64 tile image: its level-1 parent has data only in the
    # (0, 0) quadrant
    plane = np.full((TILE, TILE), 2.0, dtype=np.float32)
    got = overview_pyramid(_tiles_df(spark, plane), levels=1).collect()
    blk = np.frombuffer(got[0]["px"], dtype="<f4").reshape(TILE, TILE)
    h = TILE // 2
    assert np.all(blk[:h, :h] == 2.0)
    assert np.isnan(blk[h:, :]).all() and np.isnan(blk[:h, h:]).all()
    assert got[0]["n_valid"] == h * h
