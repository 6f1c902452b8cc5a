"""GDAL-style dtype lattice + NoData defaults (SURVEY.md section 1.2).

The reference processes Byte..Float64 rasters: a calc's output type is the
WIDEST input type (/root/reference/util/raster_calc.py:153
``myOutType = max(myDataTypeNum)`` over the GDAL ordinal lattice,
/root/reference/util/gdal_utils.py:29-41), all correction arithmetic runs
in float32 intermediates (every kernel passes
``out=input_band.astype('float32')``), and the FINAL merged output is cast
back to the input image's type (TopoCorrectionAlgorithm.py:56-57 via
get_raster_type + merge_bands DATA_TYPE, gdal_utils.py:102-110,
execution_context.py:296-323).  Per-type default NoData values come from
gdal_calc's DefaultNDVLookup (raster_calc.py:175-180 imports it;
values below mirror osgeo_utils.gdal_calc).

Engine mapping: inside the engine every pixel is float32 with NaN as the
NoData mask (decode maps source-NDV -> NaN; kernels propagate NaN,
kernels.py apply_correction).  :func:`cast_to_dtype` is the final-cast
operator: NaN -> the type's default NDV, finite values rounded to nearest
and clipped to the type range (the engine's documented equivalent of the
gdal:merge DATA_TYPE cast).
"""
from __future__ import annotations

import numpy as np

# GDAL ordinal lattice (gdal_utils.py:29-41; complex types out of scope --
# the plugin never produces them)
GDAL_ORDER = ("Byte", "Int16", "UInt16", "UInt32", "Int32",
              "Float32", "Float64")

# osgeo_utils.gdal_calc.DefaultNDVLookup (raster_calc.py:175-180)
DEFAULT_NDV = {
    "Byte": 255.0,
    "Int16": -32768.0,
    "UInt16": 65535.0,
    "UInt32": 4294967293.0,
    "Int32": -2147483647.0,
    "Float32": 3.402823466e38,
    "Float64": 1.7976931348623158e308,
}

NP_DTYPE = {
    "Byte": np.dtype("u1"),
    "Int16": np.dtype("<i2"),
    "UInt16": np.dtype("<u2"),
    "UInt32": np.dtype("<u4"),
    "Int32": np.dtype("<i4"),
    "Float32": np.dtype("<f4"),
    "Float64": np.dtype("<f8"),
}

# source dtype per image format (codecs.py): what get_raster_type would
# report for the input layer
FMT_DTYPE = {
    "raw_f32": "Float32",
    "raw_u8": "Byte",
    "raw_i16": "Int16",
    "raw_u16": "UInt16",
    "raw_u32": "UInt32",
    "raw_i32": "Int32",
    "raw_f64": "Float64",
    "png": "UInt16",        # 16-bit grayscale PNG
    "jpeg": "Float32",      # stub codec reconstructs floats (lo + scale*q)
    "tiff": "Float32",
}


def widest(types) -> str:
    """Calc output type = max input type over the GDAL lattice
    (raster_calc.py:153)."""
    return max(types, key=GDAL_ORDER.index)


def cast_to_dtype(arr: np.ndarray, gdal_type: str) -> np.ndarray:
    """float32 engine pixels -> typed output array.

    NaN (the engine NoData mask) becomes the type's default NDV
    (raster_calc.py:271-274 propagation target); finite values are rounded
    to nearest and clipped to the type range (documented engine contract
    for the gdal:merge DATA_TYPE cast, execution_context.py:296-323)."""
    dt = NP_DTYPE[gdal_type]
    ndv = DEFAULT_NDV[gdal_type]
    a = np.asarray(arr, dtype=np.float64)
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        out = np.clip(np.rint(a), info.min, info.max)
        out = np.where(np.isnan(a), ndv, out)
        return out.astype(dt)
    out = np.where(np.isnan(a), ndv, a)
    return out.astype(dt)


def decode_typed(data: bytes, gdal_type: str, bands: int, h: int,
                 w: int) -> np.ndarray:
    """Typed raw raster bytes -> float32 (bands, h, w) with the type's
    default NDV mapped to NaN (the engine-internal NoData mask)."""
    dt = NP_DTYPE[gdal_type]
    arr = np.frombuffer(data, dtype=dt).reshape(bands, h, w)
    # mask the sentinel BEFORE the narrowing cast: Float64's default NDV
    # (1.798e308) would otherwise overflow float32 and warn on every batch
    mask = arr == np.asarray(DEFAULT_NDV[gdal_type], dtype=dt)
    out = np.where(mask, np.nan, arr).astype(np.float32)
    return out


def encode_typed(px: np.ndarray, gdal_type: str) -> bytes:
    """float pixels (NaN = NoData) -> typed raw raster bytes."""
    return cast_to_dtype(px, gdal_type).tobytes()
