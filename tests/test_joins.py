"""kNN ring join + skew salting equivalence + AOI containment."""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from terraspark import cells, joins
from terraspark.fixtures import (AOI_SCHEMA, IMAGES_SCHEMA, SCENES_SCHEMA,
                                 to_spark)
from terraspark.pipeline import TopoEngine


@pytest.fixture(scope="module")
def tiles_df(spark, fixture_tables):
    images, scenes, dem, aoi, grids, oracle = fixture_tables
    eng = TopoEngine(spark)
    t = eng.tiles(to_spark(spark, images, IMAGES_SCHEMA),
                  to_spark(spark, scenes, SCENES_SCHEMA))
    t = t.where(F.col("band") == 0).persist()
    t.count()
    return t


def _expected_pairs(pdf: pd.DataFrame) -> set:
    out = set()
    by_img = pdf.groupby("image_id")
    for iid, g in by_img:
        cell_map = {}
        for r in g.itertuples(index=False):
            cell_map.setdefault(r.cell, []).append((r.tile_x, r.tile_y))
        for r in g.itertuples(index=False):
            for nb in cells.ring(r.cell, 1):
                for t2 in cell_map.get(int(nb), []):
                    out.add((iid, r.tile_x, r.tile_y, int(nb)))
    return out


def test_ring_join_matches_reference_pairs(tiles_df):
    pdf = tiles_df.select("image_id", "tile_x", "tile_y", "cell").toPandas()
    got = joins.ring_join(tiles_df, k=1).select(
        "image_id", "tile_x", "tile_y", "nbr_cell").toPandas()
    got_set = set(map(tuple, got.itertuples(index=False)))
    assert got_set == _expected_pairs(pdf)


def test_ring_join_salted_equivalent(tiles_df):
    plain = joins.ring_join(tiles_df, k=1).select(
        "image_id", "tile_x", "tile_y", "nbr_cell", "n_px")
    salted = joins.ring_join(tiles_df, k=1, salt_buckets=4).select(
        "image_id", "tile_x", "tile_y", "nbr_cell", "n_px")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0


def test_skew_cell_fan_in(tiles_df, fixture_tables):
    """The deliberately hot anchor cell must carry HILLS x more tiles."""
    counts = (tiles_df.groupBy("cell").count().toPandas()
              .sort_values("count", ascending=False))
    # 8-image fixture: 2 images on hill 0 share slot (0,0)
    assert counts["count"].iloc[0] >= 2 * counts["count"].median()


def test_aoi_join_drops_uncovered(spark, tiles_df, fixture_tables):
    images, scenes, dem, aoi, grids, oracle = fixture_tables
    aoi_df = to_spark(spark, aoi, AOI_SCHEMA)
    joined = joins.aoi_containment_join(tiles_df, aoi_df)
    pdf = joined.select("image_id", "group_id").distinct().toPandas()
    # hill-3 images (i % 4 == 3) are uncovered by any zone
    covered_images = set(pdf["image_id"])
    for iid in covered_images:
        assert int(iid.split("_")[1]) % 4 != 3
    exp = oracle.tile_groups()
    assert joined.count() == len(exp)
