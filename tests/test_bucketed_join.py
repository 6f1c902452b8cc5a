"""Bucketed co-located join: pre-bucketing both sides on the cell key
removes the join's shuffle entirely (the repeat-join scale strategy when
DEM features outgrow broadcast range)."""
import pytest
from pyspark.sql import functions as F

from terraspark import corrections, joins
from terraspark.fixtures import (DEM_SCHEMA, IMAGES_SCHEMA, SCENES_SCHEMA,
                                 to_spark)
from terraspark.pipeline import TopoEngine


def test_bucketed_join_has_no_exchange(spark, fixture_tables):
    images, scenes, dem, aoi, grids, oracle = fixture_tables
    eng = TopoEngine(spark)
    tiles = eng.tiles(to_spark(spark, images, IMAGES_SCHEMA),
                      to_spark(spark, scenes, SCENES_SCHEMA)) \
        .select("image_id", "band", "tile_x", "tile_y", "cell")
    feats = eng.dem_features(to_spark(spark, dem, DEM_SCHEMA),
                             persist=False).select("cell", "tile_x", "tile_y")

    joins.write_bucketed(tiles, "tiles_b", buckets=8)
    joins.write_bucketed(feats.withColumnRenamed("tile_x", "dtx")
                         .withColumnRenamed("tile_y", "dty"),
                         "feats_b", buckets=8)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("tiles_b").join(spark.table("feats_b"), "cell")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan          # co-located: no shuffle
        # and it computes the same join as the broadcast path
        expected = oracle.expected_join_counts()
        n = int(expected.loc[expected.stage == "tile_x_dem", "rows"].iloc[0])
        assert j.count() == n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS tiles_b")
        spark.sql("DROP TABLE IF EXISTS feats_b")
    eng.unpersist()
