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


def test_tpch_q5_dimension_joins_broadcast(spark):
    import __spark_entry__ as E
    df = E.queries()["rel_tpch_q5"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the three dimension joins must be broadcast, not shuffle
    assert plan.count("BroadcastHashJoin") >= 3
    # filters reach the scans (pushdown), scans are column-pruned
    assert "r_name" in plan and "= ASIA" in plan
    assert "o_orderdate" in plan.split("FileScan parquet [o_orderkey", 1)[1] \
        .split("FileScan", 1)[0]
    rows = {r["n_name"]: r for r in df.collect()}
    assert all(r["revenue"] > 0 for r in rows.values())
