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


def test_stats_partition_invariant(spark, fixture_tables):
    """The scalar stage is BIT-deterministic at any parallelism: the
    canonical (tile_y, tile_x)-ordered fold makes the distributed sums
    independent of partition layout.  Load-bearing: veca/teillet
    denominators cross zero in ill-conditioned scenes, so one-ulp scalar
    shifts visibly change cell statistics."""
    import pandas as pd
    images, scenes, dem, aoi, grids, oracle = fixture_tables
    eng = TopoEngine(spark)
    j = eng.joined(to_spark(spark, images, IMAGES_SCHEMA),
                   to_spark(spark, scenes, SCENES_SCHEMA),
                   to_spark(spark, dem, DEM_SCHEMA))
    a = eng.scalars_df(j).toPandas() \
        .sort_values(["image_id", "band"]).reset_index(drop=True)
    # radically different layouts: one partition vs one row per partition
    b = eng.scalars_df(j.coalesce(1)).toPandas() \
        .sort_values(["image_id", "band"]).reset_index(drop=True)
    c = eng.scalars_df(j.repartition(64, "tile_x")).toPandas() \
        .sort_values(["image_id", "band"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)      # bitwise equality
    pd.testing.assert_frame_equal(a, c)
    eng.unpersist()


def test_canonical_scalars_match_polyfit(spark, fixture_tables):
    """Independence cross-check for the shared closed-form fit: the
    canonical sufficient-statistics scalars equal the reference plugin's
    np.polynomial.polyfit on every fixture (image, band) within tight
    relative tolerance."""
    import numpy as np
    from terraspark.reference_model import _polyfit1, BANDS, IMG_H, IMG_W
    from terraspark.kernels import minnaert_xy
    from terraspark.config import DEFAULT_PARAMS

    images, scenes, dem, aoi, grids, oracle = fixture_tables
    for iid in list(oracle._decoded)[:4]:
        px = oracle._decoded[iid]
        hill, y0, x0 = oracle._windows[iid]
        slope, aspect, lum = oracle.feats[hill]
        l_win = lum[y0:y0 + IMG_H, x0:x0 + IMG_W]
        for b in range(BANDS):
            sc = oracle._scalars[iid][b]
            dn = px[b].ravel().astype(np.float64)
            valid = ~np.isnan(dn)
            dnv, lumv = dn[valid], l_win.ravel().astype(np.float64)[valid]
            mask = dnv > DEFAULT_PARAMS.pixel_ignore_threshold
            ri, rs = _polyfit1(lumv[mask], dnv[mask])
            assert abs(sc["reg_intercept"] - ri) <= 1e-6 * max(1, abs(ri))
            assert abs(sc["reg_slope"] - rs) <= 1e-6 * max(1, abs(rs))
