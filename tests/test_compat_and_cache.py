"""Input-compatibility validation + content-keyed fixture cache."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from terraspark import joins


def _tiles(spark, cells_list):
    return spark.createDataFrame(
        pd.DataFrame({"image_id": ["img_a"] * len(cells_list),
                      "cell": cells_list}),
        "image_id string, cell long")


def _feats(spark, cells_list):
    return spark.createDataFrame(
        pd.DataFrame({"cell": cells_list}), "cell long")


def test_check_compatible_ok(spark):
    tiles = _tiles(spark, [1, 2, 3])
    feats = _feats(spark, [1, 2, 3, 4])
    audit = joins.check_compatible(tiles, feats)       # strict, no raise
    assert audit.count() == 0


def test_check_compatible_raises_on_misaligned_dem(spark):
    tiles = _tiles(spark, [1, 2, 3, 99, 100])
    feats = _feats(spark, [1, 2, 3])
    with pytest.raises(joins.IncompatibleRastersError) as ei:
        joins.check_compatible(tiles, feats)
    assert "img_a=2" in str(ei.value)
    audit = joins.check_compatible(tiles, feats, strict=False).toPandas()
    assert audit.loc[0, "uncovered_tiles"] == 2


def test_source_digest_tracks_content(tmp_path):
    """The fixture disk cache is keyed by a digest of the terraspark
    sources: changing ONE byte of any module (e.g. a kernel constant)
    invalidates it automatically -- no manual version bump."""
    import __spark_entry__ as E

    pkg = tmp_path / "terraspark"
    pkg.mkdir()
    (tmp_path / "__spark_entry__.py").write_text("# entry\n")
    (pkg / "kernels.py").write_text("THRESHOLD = 5.0\n")
    d1 = E._source_digest(str(tmp_path))
    d1b = E._source_digest(str(tmp_path))
    assert d1 == d1b                                  # stable
    (pkg / "kernels.py").write_text("THRESHOLD = 6.0\n")
    assert E._source_digest(str(tmp_path)) != d1      # content-sensitive
    # adding a module changes it too
    (pkg / "new_op.py").write_text("x = 1\n")
    d3 = E._source_digest(str(tmp_path))
    assert d3 != d1
    # non-source files are ignored
    (pkg / "notes.txt").write_text("irrelevant\n")
    assert E._source_digest(str(tmp_path)) == d3
    # the real repo digest is pinned to real sources
    assert len(E._source_digest()) == 16
