"""Baseline-TIFF codec (the reference's native GeoTIFF interchange) through
the full tiling pipeline."""
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from terraspark import codecs, tiff
from terraspark.config import BANDS, IMG_H, IMG_W
from terraspark.fixtures import IMAGES_SCHEMA, SCENES_SCHEMA, to_spark
from terraspark.tiling import tile_images


@given(st.integers(0, 2**31), st.integers(1, 5), st.integers(4, 40),
       st.integers(4, 40))
@settings(max_examples=30, deadline=None)
def test_tiff_roundtrip_prop(seed, bands, h, w):
    rng = np.random.default_rng(seed)
    px = rng.uniform(-1e5, 1e5, (bands, h, w)).astype(np.float32)
    out, scale, tie = tiff.decode(tiff.encode(px))
    assert np.array_equal(px, out)
    assert scale is None and tie is None


def test_tiff_geo_tags():
    px = np.zeros((1, 4, 4), dtype=np.float32)
    data = tiff.encode(px, pixel_scale=(1e-4, 1e-4), tiepoint=(-105.5, 40.25))
    _, scale, tie = tiff.decode(data)
    assert scale == (1e-4, 1e-4)
    assert tie == (-105.5, 40.25)


def test_tiff_nan_nodata_roundtrip():
    px = np.full((2, 8, 8), 5.0, dtype=np.float32)
    px[0, 3, 3] = np.nan
    out, _, _ = tiff.decode(tiff.encode(px))
    assert np.isnan(out[0, 3, 3])
    assert np.array_equal(px[~np.isnan(px)], out[~np.isnan(out)])


def test_tiff_rejects_compressed():
    px = np.zeros((1, 4, 4), dtype=np.float32)
    data = bytearray(tiff.encode(px))
    # flip the COMPRESSION tag value (tag 259) to 5 (LZW)
    import struct
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for i in range(n):
        tag, typ, count = struct.unpack_from("<HHI", data, ifd_off + 2 + i * 12)
        if tag == 259:
            struct.pack_into("<H", data, ifd_off + 2 + i * 12 + 8, 5)
    with pytest.raises(ValueError, match="compressed"):
        tiff.decode(bytes(data))


def test_tiff_through_tiling_pipeline(spark, fixture_tables):
    """Re-encode fixture images as TIFF; the pipeline must produce
    byte-identical tiles to the raw_f32 path (TIFF float32 is lossless)."""
    images, scenes, dem, aoi, grids, oracle = fixture_tables
    rows = []
    for _, r in images.head(4).iterrows():
        px = codecs.decode(r["bytes"], r["fmt"], BANDS, IMG_H, IMG_W)
        rows.append({"image_id": r["image_id"],
                     "bytes": tiff.encode(px), "w": IMG_W, "h": IMG_H,
                     "fmt": "tiff", "caption": r["caption"],
                     "phash": codecs.dhash64(px)})
    tdf = to_spark(spark, pd.DataFrame(rows), IMAGES_SCHEMA)
    sdf = to_spark(spark, scenes, SCENES_SCHEMA)
    got = tile_images(tdf, sdf).toPandas()
    assert len(got) == 4 * BANDS * 16
    assert got["phash_ok"].all()
    # compare against oracle's decoded pixels tile-by-tile
    from terraspark.config import TILE
    for r in got.itertuples(index=False):
        tile_px = np.frombuffer(r.px, dtype="<f4").reshape(TILE, TILE)
        exp = oracle.decoded(r.image_id)[
            r.band, r.tile_y * TILE:(r.tile_y + 1) * TILE,
            r.tile_x * TILE:(r.tile_x + 1) * TILE]
        both_nan = np.isnan(tile_px) & np.isnan(exp)
        assert np.array_equal(tile_px[~both_nan], exp[~both_nan]), \
            (r.image_id, r.band)
