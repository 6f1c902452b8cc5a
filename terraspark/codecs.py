"""Image codecs for the opaque ``bytes`` column (pure stdlib + numpy).

The input table carries encoded multiband images (input_hint schema:
image_id, bytes, w, h, fmt, caption, phash).  Three formats:

* ``raw_f32`` -- little-endian float32, C-order, shape (bands, h, w).
  Lossless; NaN is the NoData sentinel (the engine propagates it the way
  the reference propagates NDV, /root/reference/util/raster_calc.py:256-274).
* ``png``     -- REAL PNG: 16-bit grayscale, zlib/stdlib implementation
  (filter type 0).  Bands are stacked vertically (bands*h rows).  Lossless.
* ``jpeg``    -- STUB lossy codec.  Real JPEG libraries (PIL etc.) are not
  in this container, so this is a clearly-marked deterministic stand-in:
  per-band affine 8-bit quantization + zlib.  It is genuinely lossy
  (quantization error), exercising the PSNR>=40dB acceptance path from
  BASELINE.json, and is deterministic so tests are stable.  The Spark-side
  plumbing (schema, batch shape, mapInPandas decode) is format-agnostic and
  real; swap `_jpeg_*` for a real codec when a JPEG lib is available.

All functions operate on numpy arrays shaped (bands, h, w) float32.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ----------------------------------------------------------------- raw_f32
def _raw_encode(px: np.ndarray) -> bytes:
    return np.ascontiguousarray(px, dtype="<f4").tobytes()


def _raw_decode(data: bytes, bands: int, h: int, w: int) -> np.ndarray:
    return np.frombuffer(data, dtype="<f4").reshape(bands, h, w).copy()


# --------------------------------------------------------------------- png
def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_encode(px: np.ndarray) -> bytes:
    """16-bit grayscale PNG; bands stacked vertically."""
    bands, h, w = px.shape
    arr = np.clip(np.rint(px), 0, 65535).astype(">u2").reshape(bands * h, w)
    raw = b"".join(b"\x00" + row.tobytes() for row in arr)
    ihdr = struct.pack(">IIBBBBB", w, bands * h, 16, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_decode(data: bytes, bands: int, h: int, w: int) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    width = height = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            width, height, bitdepth, ctype = struct.unpack(">IIBB", body[:10])
            if bitdepth != 16 or ctype != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + width * 2
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
    if not (rows[:, 0] == 0).all():
        raise ValueError("only filter 0 supported")
    arr = rows[:, 1:].reshape(height, width, 2)
    vals = (arr[:, :, 0].astype(np.uint16) << 8) | arr[:, :, 1]
    return vals.reshape(bands, h, w).astype(np.float32)


# ----------------------------------------------------------- jpeg (STUB)
def _jpeg_encode(px: np.ndarray) -> bytes:
    """Deterministic fake lossy codec (see module docstring)."""
    bands, h, w = px.shape
    out = [struct.pack("<4sIII", b"FJPG", bands, h, w)]
    payload = []
    for b in range(bands):
        lo = float(np.nanmin(px[b]))
        hi = float(np.nanmax(px[b]))
        scale = (hi - lo) / 255.0 if hi > lo else 1.0
        q = np.clip(np.rint((px[b] - lo) / scale), 0, 255).astype(np.uint8)
        out.append(struct.pack("<ff", lo, scale))
        payload.append(q.tobytes())
    out.append(zlib.compress(b"".join(payload), 6))
    return b"".join(out)


def _jpeg_decode(data: bytes, bands: int, h: int, w: int) -> np.ndarray:
    magic, nb, hh, ww = struct.unpack("<4sIII", data[:16])
    if magic != b"FJPG":
        raise ValueError("not a FJPG stub stream")
    pos = 16
    los, scales = [], []
    for _ in range(nb):
        lo, scale = struct.unpack("<ff", data[pos : pos + 8])
        los.append(lo)
        scales.append(scale)
        pos += 8
    q = np.frombuffer(zlib.decompress(data[pos:]), dtype=np.uint8)
    q = q.reshape(nb, hh, ww).astype(np.float32)
    out = np.empty_like(q)
    for b in range(nb):
        out[b] = q[b] * scales[b] + los[b]
    return out


# ------------------------------------------------------------------ facade
# typed raw rasters (the FULL GDAL Byte..Float64 lattice, SURVEY section
# 1.2): pixels stored in the native type with the type's DefaultNDVLookup
# value as NoData sentinel (raster_calc.py:175-180)
_TYPED_RAW = {"raw_u8": "Byte", "raw_i16": "Int16", "raw_u16": "UInt16",
              "raw_u32": "UInt32", "raw_i32": "Int32", "raw_f64": "Float64"}


def encode(px: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw_f32":
        return _raw_encode(px)
    if fmt in _TYPED_RAW:
        from . import dtypes
        return dtypes.encode_typed(px, _TYPED_RAW[fmt])
    if fmt == "png":
        return _png_encode(px)
    if fmt == "jpeg":
        return _jpeg_encode(px)
    if fmt == "tiff":
        from . import tiff
        return tiff.encode(px)
    raise ValueError(f"unknown fmt: {fmt}")


def decode(data: bytes, fmt: str, bands: int, h: int, w: int) -> np.ndarray:
    """Decode to float32 (bands, h, w); source NoData -> NaN."""
    if fmt == "raw_f32":
        return _raw_decode(data, bands, h, w)
    if fmt in _TYPED_RAW:
        from . import dtypes
        return dtypes.decode_typed(data, _TYPED_RAW[fmt], bands, h, w)
    if fmt == "png":
        return _png_decode(data, bands, h, w)
    if fmt == "jpeg":
        return _jpeg_decode(data, bands, h, w)
    if fmt == "tiff":
        from . import tiff
        px, _, _ = tiff.decode(data)
        if px.shape != (bands, h, w):
            raise ValueError(f"tiff shape {px.shape} != {(bands, h, w)}")
        return px
    raise ValueError(f"unknown fmt: {fmt}")


def is_lossy(fmt: str) -> bool:
    return fmt == "jpeg"


# ------------------------------------------------------------------- phash
def dhash64(px: np.ndarray) -> int:
    """Deterministic 64-bit difference hash of band 0.

    Block-mean downsample to 8x9, compare horizontal neighbors -> 64 bits.
    Pure numpy; used for the ``phash`` lineage/integrity column.
    """
    band = np.nan_to_num(px[0].astype(np.float64), nan=0.0)
    h, w = band.shape
    gh, gw = 8, 9
    ys = (np.arange(gh + 1) * h) // gh
    xs = (np.arange(gw + 1) * w) // gw
    grid = np.empty((gh, gw), dtype=np.float64)
    for i in range(gh):
        for j in range(gw):
            grid[i, j] = band[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (grid[:, 1:] > grid[:, :-1]).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # two's-complement into int64 range for a BIGINT column
    return val - (1 << 64) if val >= (1 << 63) else val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (peak from reference array a)."""
    a64 = a.astype(np.float64)
    b64 = b.astype(np.float64)
    mse = float(np.nanmean((a64 - b64) ** 2))
    if mse == 0:
        return float("inf")
    peak = float(np.nanmax(a64) - np.nanmin(a64)) or 1.0
    return 10.0 * np.log10(peak * peak / mse)
