"""Dtype lattice + NDV semantics (SURVEY section 1.2; VERDICT r1 gap #1).

Reference contract: output type of a calc = widest input type
(raster_calc.py:153), per-type default NDV (raster_calc.py:175-180),
any-input-NDV -> output-NDV propagation (raster_calc.py:256-274), final
cast back to the input image's type (TopoCorrectionAlgorithm.py:56-57).
"""
import numpy as np
import pytest

from terraspark import codecs, dtypes

nan = float("nan")


def test_widest_follows_gdal_ordinal_lattice():
    assert dtypes.widest(["Byte", "UInt16"]) == "UInt16"
    assert dtypes.widest(["UInt16", "Float32"]) == "Float32"
    assert dtypes.widest(["Int32", "Int16", "Byte"]) == "Int32"
    assert dtypes.widest(["Float64", "Float32"]) == "Float64"
    # the correction calc: integer DN x Float32 terrain -> Float32
    assert dtypes.widest(["UInt16", "Float32", "Float32"]) == "Float32"


@pytest.mark.parametrize("gdal_t,lo,hi", [
    ("Byte", 0, 254), ("Int16", -32000, 32000), ("UInt16", 0, 65000),
    ("UInt32", 0, 100000), ("Int32", -100000, 100000),
    ("Float64", -1000, 1000),
])
def test_typed_roundtrip_with_ndv(gdal_t, lo, hi):
    rng = np.random.default_rng(1)
    px = rng.uniform(lo, hi, (2, 16, 16)).astype(np.float32)
    if gdal_t != "Float64":
        px = np.rint(px).astype(np.float32)
    px[0, 3, 4] = nan
    px[1, 0, 0] = nan
    data = dtypes.encode_typed(px, gdal_t)
    back = dtypes.decode_typed(data, gdal_t, 2, 16, 16)
    assert np.isnan(back[0, 3, 4]) and np.isnan(back[1, 0, 0])
    m = ~np.isnan(px)
    assert np.array_equal(back[m], px[m])
    # NDV pixels are byte-identical to the type's default sentinel
    raw = np.frombuffer(data, dtype=dtypes.NP_DTYPE[gdal_t]).reshape(2, 16, 16)
    assert raw[0, 3, 4] == dtypes.NP_DTYPE[gdal_t].type(
        dtypes.DEFAULT_NDV[gdal_t])


def test_cast_clips_and_rounds():
    arr = np.array([[-5.0, 0.49, 0.51, 300.0, nan]], dtype=np.float32)
    out = dtypes.cast_to_dtype(arr, "Byte")
    assert out.dtype == np.uint8
    assert list(out[0]) == [0, 0, 1, 254 + 1, 255]  # clip hi=255, NaN->255
    out16 = dtypes.cast_to_dtype(arr, "Int16")
    assert out16.dtype == np.int16
    assert list(out16[0]) == [-5, 0, 1, 300, -32768]


def test_codec_facade_typed_formats():
    rng = np.random.default_rng(2)
    px = np.rint(rng.uniform(0, 9000, (4, 32, 32))).astype(np.float32)
    px[:, 5, 5] = nan
    for fmt in ("raw_u16", "raw_i16", "raw_u32", "raw_i32", "raw_f64"):
        data = codecs.encode(px, fmt)
        back = codecs.decode(data, fmt, 4, 32, 32)
        assert np.isnan(back[:, 5, 5]).all()
        m = ~np.isnan(px)
        assert np.array_equal(back[m], px[m])
    assert not codecs.is_lossy("raw_u16")


def test_typed_fixture_images_decode_with_ndv():
    from terraspark.config import BANDS, IMG_H, IMG_W
    from terraspark.fixtures import build_tables, typed_fmt
    images, *_ = build_tables(6, fmt_of=typed_fmt)
    assert list(images["fmt"]) == ["raw_u16", "raw_u8", "raw_i16",
                                   "raw_u32", "raw_i32", "raw_f64"]
    for _, r in images.iterrows():
        px = codecs.decode(r["bytes"], r["fmt"], BANDS, IMG_H, IMG_W)
        assert np.isnan(px).any()                  # NDV present
        assert np.nanmax(px) <= 100000
        assert codecs.dhash64(px) == r["phash"]    # integrity column holds