"""Collected vs distributed scalar paths agree (same closed forms)."""
import numpy as np

from terraspark import corrections
from terraspark.fixtures import (DEM_SCHEMA, IMAGES_SCHEMA, SCENES_SCHEMA,
                                 to_spark)
from terraspark.pipeline import TopoEngine


def test_scalar_paths_agree(spark, fixture_tables):
    images, scenes, dem, aoi, grids, oracle = fixture_tables
    eng = TopoEngine(spark)
    j = eng.joined(to_spark(spark, images, IMAGES_SCHEMA),
                   to_spark(spark, scenes, SCENES_SCHEMA),
                   to_spark(spark, dem, DEM_SCHEMA))
    pd_sc = eng.scalars(j).sort_values(["image_id", "band"]).reset_index(drop=True)
    df_sc = eng.scalars_df(j).toPandas().sort_values(
        ["image_id", "band"]).reset_index(drop=True)
    for c in ("reg_intercept", "reg_slope", "c", "k", "pbc_c",
              "band_mean", "lum_mean"):
        a = pd_sc[c].to_numpy(dtype=float)
        b = df_sc[c].to_numpy(dtype=float)
        assert np.allclose(a, b, rtol=1e-9, atol=1e-12), c
    eng.unpersist()
