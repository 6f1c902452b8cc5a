"""End-to-end: decode -> tile -> cell assign -> DEM join -> correct,
validated per-tile against the numpy reference model (BASELINE.json gates:
allclose / PSNR>=40dB, caption equality, exact tile->cell assignments and
join row counts)."""
import numpy as np
import pandas as pd
import pytest

from terraspark import cells
from terraspark.config import BANDS, METHODS, TILE, DEFAULT_PARAMS
from terraspark.fixtures import (AOI_SCHEMA, DEM_SCHEMA, IMAGES_SCHEMA,
                                 SCENES_SCHEMA, to_spark)
from terraspark.pipeline import TopoEngine, correction_summary


@pytest.fixture(scope="module")
def run(spark, fixture_tables):
    images, scenes, dem, aoi, grids, oracle = fixture_tables
    eng = TopoEngine(spark)
    images_df = to_spark(spark, images, IMAGES_SCHEMA)
    scenes_df = to_spark(spark, scenes, SCENES_SCHEMA)
    dem_df = to_spark(spark, dem, DEM_SCHEMA)
    tiles = eng.tiles(images_df, scenes_df)
    joined = eng.joined(images_df, scenes_df, dem_df)
    corrected = eng.correct(images_df, scenes_df, dem_df, METHODS)
    cpdf = corrected.toPandas()
    return {
        "engine": eng, "oracle": oracle, "tiles": tiles.toPandas(),
        "joined": joined, "corrected": cpdf, "images": images,
        "aoi": aoi,
    }


def test_tile_cell_assignments_exact(run):
    got = run["tiles"][run["tiles"]["band"] == 0][
        ["image_id", "tile_x", "tile_y", "cell"]
    ].sort_values(["image_id", "tile_y", "tile_x"]).reset_index(drop=True)
    exp = run["oracle"].expected_assignments()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_phash_integrity(run):
    assert run["tiles"]["phash_ok"].all()


def test_join_row_counts_exact(run):
    exp = run["oracle"].expected_join_counts()
    n_dem = run["joined"].count()
    assert n_dem == int(exp.loc[exp.stage == "tile_x_dem", "rows"].iloc[0])
    # AOI containment join count
    aoi_cells = run["aoi"].explode("cells")[["aoi_id", "cells"]]
    tiles0 = run["tiles"][run["tiles"]["band"] == 0]
    n_aoi = tiles0.merge(aoi_cells, left_on="cell", right_on="cells").shape[0]
    assert n_aoi == int(exp.loc[exp.stage == "tile_x_aoi", "rows"].iloc[0])


def test_caption_equality(run):
    caps = run["images"].set_index("image_id")["caption"]
    got = run["corrected"].groupby("image_id")["caption"].unique()
    for iid, arr in got.items():
        assert list(arr) == [caps[iid]]


def test_corrected_tiles_allclose(run):
    oracle = run["oracle"]
    cpdf = run["corrected"]
    assert len(cpdf) == len(run["images"]) * BANDS * 16 * len(METHODS)
    worst = {}
    for r in cpdf.itertuples(index=False):
        got = np.frombuffer(r.px, dtype="<f4").reshape(TILE, TILE)
        exp = oracle.corrected_tile(r.image_id, r.method, r.band,
                                    r.tile_x, r.tile_y)
        g, e = got.ravel(), exp.ravel()
        both_nan = np.isnan(g) & np.isnan(e)
        gv, ev = g[~both_nan], e[~both_nan]
        finite = np.isfinite(gv) & np.isfinite(ev)
        # non-finite pattern must match exactly (inf from unguarded divides)
        assert np.array_equal(np.isfinite(gv), np.isfinite(ev)), \
            (r.image_id, r.method, r.band)
        scale = max(1.0, float(np.abs(ev[finite]).max()) if finite.any() else 1.0)
        err = float(np.abs(gv[finite] - ev[finite]).max()) / scale if finite.any() else 0.0
        key = (r.method,)
        worst[key] = max(worst.get(key, 0.0), err)
        assert err < 5e-4, (r.image_id, r.method, r.band, r.tile_x, r.tile_y, err)


def test_lossy_psnr_gate(run):
    """Corrected-from-jpeg vs corrected-from-decoded parity is exact by
    construction; the PSNR>=40dB gate applies to the codec itself."""
    from terraspark import codecs
    from terraspark.fixtures import image_pixels, Layout, dem_grid
    from terraspark.fixtures import dem_features as df_feats
    lay = Layout(8)
    lum = df_feats(dem_grid(3, lay), DEFAULT_PARAMS)[2]
    px = image_pixels(3, lay, lum, DEFAULT_PARAMS)
    dec = codecs.decode(codecs.encode(px, "jpeg"), "jpeg", BANDS, 256, 256)
    assert codecs.psnr(px, dec) >= 40.0
