"""Full circle: decode -> tile -> correct -> reassemble -> GeoTIFF out,
byte-comparable to the oracle's whole-image corrected arrays."""
import numpy as np
import pytest

from terraspark import tiff
from terraspark.config import BANDS, TILE
from terraspark.fixtures import (DEM_SCHEMA, IMAGES_SCHEMA, SCENES_SCHEMA,
                                 to_spark)
from terraspark.pipeline import TopoEngine
from terraspark.sinks import reassemble_geotiff


def test_reassembled_geotiff_matches_oracle(spark, fixture_tables):
    images, scenes, dem, aoi, grids, oracle = fixture_tables
    eng = TopoEngine(spark)
    scenes_df = to_spark(spark, scenes, SCENES_SCHEMA)
    corrected = eng.correct(to_spark(spark, images, IMAGES_SCHEMA),
                            scenes_df, to_spark(spark, dem, DEM_SCHEMA),
                            methods=("cosine_t",))
    out = reassemble_geotiff(corrected, scenes_df).toPandas()
    assert len(out) == len(images)
    scn = scenes.set_index("image_id")
    for r in out.itertuples(index=False):
        px, scale, tie = tiff.decode(r.tiff)
        assert px.shape == (BANDS, 256, 256)
        assert tie == (scn.loc[r.image_id, "lon0"], scn.loc[r.image_id, "lat0"])
        exp = oracle._corrected[r.image_id]["cosine_t"]
        both_nan = np.isnan(px) & np.isnan(exp)
        g, e = px[~both_nan], exp[~both_nan]
        fin = np.isfinite(g) & np.isfinite(e)
        scale_ = max(1.0, float(np.abs(e[fin]).max()))
        assert float(np.abs(g[fin] - e[fin]).max()) / scale_ < 5e-4, r.image_id
        # caption survives the whole round trip (BASELINE.json invariant)
        assert r.caption == images.set_index("image_id").loc[
            r.image_id, "caption"]
    eng.unpersist()
