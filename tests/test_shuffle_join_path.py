"""The shuffle-join DEM path (broadcast_dem=False, AQE skew-join territory)
produces exactly the same join as the broadcast path."""
from pyspark.sql import functions as F

from terraspark import corrections
from terraspark.fixtures import (DEM_SCHEMA, IMAGES_SCHEMA, SCENES_SCHEMA,
                                 to_spark)
from terraspark.pipeline import TopoEngine


def test_shuffle_join_equals_broadcast(spark, fixture_tables):
    images, scenes, dem, aoi, grids, oracle = fixture_tables
    eng = TopoEngine(spark)
    tiles = eng.tiles(to_spark(spark, images, IMAGES_SCHEMA),
                      to_spark(spark, scenes, SCENES_SCHEMA))
    feats = eng.dem_features(to_spark(spark, dem, DEM_SCHEMA))
    cols = ["image_id", "band", "tile_x", "tile_y", "cell"]
    bc = corrections.join_dem(tiles, feats, broadcast_dem=True).select(*cols)
    sh = corrections.join_dem(tiles, feats, broadcast_dem=False).select(*cols)
    assert bc.count() == sh.count()
    assert bc.exceptAll(sh).count() == 0
    exp = oracle.expected_join_counts()
    assert bc.count() == int(exp.loc[exp.stage == "tile_x_dem", "rows"].iloc[0])
    eng.unpersist()
