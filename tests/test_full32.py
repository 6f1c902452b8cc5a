"""Opt-in full-correctness run at FIXTURES.md scale (32 images, skew cell,
all 11 methods).  Enable with TERRASPARK_FULL=1 -- the default suite uses
the 8-image set to stay fast."""
import os

import numpy as np
import pytest

from terraspark.config import BANDS, METHODS, TILE
from terraspark.fixtures import (DEM_SCHEMA, IMAGES_SCHEMA, SCENES_SCHEMA,
                                 build_tables, to_spark)
from terraspark.pipeline import TopoEngine
from terraspark.reference_model import OracleRun

pytestmark = pytest.mark.skipif(
    os.environ.get("TERRASPARK_FULL") != "1",
    reason="set TERRASPARK_FULL=1 for the 32-image full run")


def test_full_32_images(spark):
    images, scenes, dem, aoi, grids = build_tables(32)
    oracle = OracleRun(32, images, scenes, grids, aoi)
    eng = TopoEngine(spark)
    corrected = eng.correct(to_spark(spark, images, IMAGES_SCHEMA),
                            to_spark(spark, scenes, SCENES_SCHEMA),
                            to_spark(spark, dem, DEM_SCHEMA), METHODS)
    cpdf = corrected.toPandas()
    assert len(cpdf) == 32 * BANDS * 16 * len(METHODS)
    bad = 0
    for r in cpdf.itertuples(index=False):
        got = np.frombuffer(r.px, dtype="<f4").reshape(TILE, TILE).ravel()
        exp = oracle.corrected_tile(r.image_id, r.method, r.band,
                                    r.tile_x, r.tile_y).ravel()
        both_nan = np.isnan(got) & np.isnan(exp)
        g, e = got[~both_nan], exp[~both_nan]
        fin = np.isfinite(g) & np.isfinite(e)
        assert np.array_equal(np.isfinite(g), np.isfinite(e))
        if fin.any():
            scale = max(1.0, float(np.abs(e[fin]).max()))
            if float(np.abs(g[fin] - e[fin]).max()) / scale >= 5e-4:
                bad += 1
    assert bad == 0
    eng.unpersist()
