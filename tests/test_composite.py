"""Temporal composite invariants: NaN-masked pixels recover from any
unmasked epoch, float64 median matches numpy bit-for-bit, partition
invariance, stat validation."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from terraspark.composite import temporal_composite
from terraspark.config import TILE


def _tiles(spark, planes, group=0):
    """One (band=0, tile 0,0) position with the given epoch planes."""
    rows = [(group, f"e{i}", 0, 0, 0,
             np.asarray(p, dtype="<f4").tobytes())
            for i, p in enumerate(planes)]
    return spark.createDataFrame(
        rows, "scene_group int, image_id string, band int, "
              "tile_x int, tile_y int, px binary")


def _plane(fill):
    return np.full((TILE, TILE), fill, dtype=np.float32)


def test_median_matches_numpy_and_masks_recover(spark):
    a, b, c = _plane(1.0), _plane(5.0), _plane(9.0)
    a[0, 0] = np.nan          # masked in one epoch -> median of (5, 9)
    b[0, 1] = np.nan
    c[0, 1] = np.nan          # masked in two -> the remaining value
    a[0, 2] = b[0, 2] = c[0, 2] = np.nan   # masked everywhere -> NaN
    got = temporal_composite(_tiles(spark, [a, b, c])).collect()[0]
    comp = np.frombuffer(got["px"], dtype="<f8").reshape(TILE, TILE)
    exp = np.nanmedian(np.stack([a, b, c]).astype(np.float64), axis=0)
    assert got["n_epochs"] == 3
    assert got["n_valid"] == TILE * TILE - 1
    assert np.array_equal(comp, exp, equal_nan=True)
    assert comp[0, 0] == 7.0 and comp[0, 1] == 1.0
    assert np.isnan(comp[0, 2])


def test_all_masked_block_is_nan(spark):
    a = _plane(np.nan)
    got = temporal_composite(_tiles(spark, [a, a])).collect()[0]
    assert got["n_valid"] == 0
    assert got["mean_val"] is None or np.isnan(got["mean_val"])


def test_mean_and_max_stats(spark):
    a, b = _plane(2.0), _plane(6.0)
    got_mean = temporal_composite(_tiles(spark, [a, b]),
                                  stat="mean").collect()[0]
    got_max = temporal_composite(_tiles(spark, [a, b]),
                                 stat="max").collect()[0]
    assert got_mean["mean_val"] == 4.0
    assert got_max["mean_val"] == 6.0
    with pytest.raises(ValueError, match="stat"):
        temporal_composite(_tiles(spark, [a, b]), stat="mode")


def test_partition_invariance(spark):
    rng = np.random.default_rng(7)
    planes = [rng.normal(size=(TILE, TILE)).astype(np.float32)
              for _ in range(5)]
    base = _tiles(spark, planes)
    a = temporal_composite(base.repartition(1)).collect()[0]
    b = temporal_composite(base.repartition(5, "image_id")).collect()[0]
    assert a["px"] == b["px"] and a["mean_val"] == b["mean_val"]
