"""Minimal baseline TIFF codec: uncompressed float32, multiband, geo tags.

The reference's native storage is GeoTIFF (every correction writes per-band
GTiff files, /root/reference/util/raster_calc.py:141-192, merged via
gdal:merge).  This module implements the subset needed for real
interchange, from the public TIFF 6.0 + GeoTIFF specs, with no external
libraries:

* little-endian classic TIFF, one IFD
* SamplesPerPixel = bands, PlanarConfiguration = 2 (band-sequential,
  matching the reference's per-band processing), SampleFormat = 3
  (IEEE float), BitsPerSample = 32, one strip per band
* GeoTIFF georeferencing via ModelPixelScaleTag (33550) and
  ModelTiepointTag (33922) -- the raster-to-world transform the reference
  copies input -> output (raster_calc.py:164-173)

Decode accepts exactly what encode produces plus the common variations
(PlanarConfiguration 1 chunky float32, multiple strips per plane).
"""
from __future__ import annotations

import struct

import numpy as np

_II = b"II*\x00"

# tag ids
W, H = 256, 257
BITS, COMPRESSION, PHOTOMETRIC = 258, 259, 262
STRIP_OFFSETS, SPP, ROWS_PER_STRIP, STRIP_COUNTS = 273, 277, 278, 279
PLANAR, SAMPLE_FORMAT = 284, 339
MODEL_PIXEL_SCALE, MODEL_TIEPOINT = 33550, 33922

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}


def encode(px: np.ndarray, pixel_scale: tuple[float, float] | None = None,
           tiepoint: tuple[float, float] | None = None) -> bytes:
    """(bands, h, w) float32 -> baseline TIFF bytes.

    pixel_scale = (sx, sy) degrees/px; tiepoint = (lon, lat) of the raster's
    NW corner (GeoTIFF ModelTiepoint with raster point (0,0))."""
    bands, h, w = px.shape
    data = np.ascontiguousarray(px, dtype="<f4")
    strip_bytes = h * w * 4

    entries = []          # (tag, type, count, value_or_payload)
    entries.append((W, 3, 1, w))
    entries.append((H, 3, 1, h))
    entries.append((BITS, 3, bands, [32] * bands))
    entries.append((COMPRESSION, 3, 1, 1))        # none
    entries.append((PHOTOMETRIC, 3, 1, 1))        # BlackIsZero
    entries.append((SPP, 3, 1, bands))
    entries.append((ROWS_PER_STRIP, 3, 1, h))
    entries.append((PLANAR, 3, 1, 2))             # band-sequential
    entries.append((SAMPLE_FORMAT, 3, bands, [3] * bands))  # IEEE float
    if pixel_scale is not None:
        sx, sy = pixel_scale
        entries.append((MODEL_PIXEL_SCALE, 12, 3, [sx, sy, 0.0]))
    if tiepoint is not None:
        lon, lat = tiepoint
        entries.append((MODEL_TIEPOINT, 12, 6,
                        [0.0, 0.0, 0.0, lon, lat, 0.0]))
    entries.append((STRIP_OFFSETS, 4, bands, None))   # patched below
    entries.append((STRIP_COUNTS, 4, bands, [strip_bytes] * bands))
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    ifd_offset = 8
    ifd_size = 2 + n * 12 + 4
    # out-of-line payload area follows the IFD
    payload_at = ifd_offset + ifd_size
    payloads = []

    def pack_value(tag, typ, count, value):
        nonlocal payload_at
        if typ == 3:
            vals = value if isinstance(value, list) else [value]
            raw = struct.pack(f"<{count}H", *vals)
        elif typ == 4:
            vals = value if isinstance(value, list) else [value]
            raw = struct.pack(f"<{count}I", *vals)
        elif typ == 12:
            raw = struct.pack(f"<{count}d", *value)
        else:
            raise ValueError(typ)
        if len(raw) <= 4:
            return raw.ljust(4, b"\x00"), None
        off = payload_at
        payloads.append(raw)
        payload_at += len(raw)
        return struct.pack("<I", off), raw

    # first pass to size payloads (strip offsets resolved after)
    strip_data_at = None
    packed = []
    for tag, typ, count, value in entries:
        if tag == STRIP_OFFSETS:
            # placeholder; recompute after payload sizes known
            packed.append([tag, typ, count, None])
            if count > 1:
                payloads.append(b"\x00" * (4 * count))
                packed[-1].append(payload_at)
                payload_at += 4 * count
            continue
        v4, _ = pack_value(tag, typ, count, value)
        packed.append([tag, typ, count, v4])
    strip_data_at = payload_at
    offsets = [strip_data_at + i * strip_bytes for i in range(bands)]

    # finalize strip offsets
    pi = 0
    out_payloads = []
    for e in packed:
        if e[3] is None:      # strip offsets entry
            raw = struct.pack(f"<{e[2]}I", *offsets)
            if len(raw) <= 4:
                e[3] = raw.ljust(4, b"\x00")
            else:
                e[3] = struct.pack("<I", e[4])
    # rebuild payload blob in original order, replacing the placeholder
    blob = b""
    for raw in payloads:
        if raw == b"\x00" * len(raw) and len(raw) == 4 * bands and bands > 1:
            blob += struct.pack(f"<{bands}I", *offsets)
        else:
            blob += raw

    ifd = struct.pack("<H", n)
    for tag, typ, count, v4, *rest in packed:
        ifd += struct.pack("<HHI", tag, typ, count) + v4
    ifd += struct.pack("<I", 0)

    header = _II + struct.pack("<I", ifd_offset)
    return header + ifd + blob + data.tobytes()


def decode(data: bytes):
    """TIFF bytes -> ((bands, h, w) float32, pixel_scale, tiepoint)."""
    if data[:4] != _II:
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from("<HHI", data, ifd_off + 2 + i * 12)
        voff = ifd_off + 2 + i * 12 + 8
        size = _TYPE_SIZE[typ] * count
        if size > 4:
            (voff,) = struct.unpack_from("<I", data, voff)
        if typ == 3:
            vals = struct.unpack_from(f"<{count}H", data, voff)
        elif typ == 4:
            vals = struct.unpack_from(f"<{count}I", data, voff)
        elif typ == 12:
            vals = struct.unpack_from(f"<{count}d", data, voff)
        else:
            vals = data[voff:voff + size]
        tags[tag] = list(vals) if not isinstance(vals, bytes) else vals

    w, h = tags[W][0], tags[H][0]
    bands = tags.get(SPP, [1])[0]
    if tags.get(COMPRESSION, [1])[0] != 1:
        raise ValueError("compressed TIFF not supported")
    if tags.get(SAMPLE_FORMAT, [3] * bands)[0] != 3 or \
            tags.get(BITS, [32])[0] != 32:
        raise ValueError("only float32 samples supported")
    planar = tags.get(PLANAR, [1])[0]
    offsets = tags[STRIP_OFFSETS]
    counts = tags[STRIP_COUNTS]
    raw = b"".join(data[o:o + c] for o, c in zip(offsets, counts))
    arr = np.frombuffer(raw, dtype="<f4")
    if planar == 2:
        px = arr.reshape(bands, h, w)
    else:
        px = arr.reshape(h, w, bands).transpose(2, 0, 1)
    scale = tuple(tags[MODEL_PIXEL_SCALE][:2]) if MODEL_PIXEL_SCALE in tags \
        else None
    tie = (tags[MODEL_TIEPOINT][3], tags[MODEL_TIEPOINT][4]) \
        if MODEL_TIEPOINT in tags else None
    return px.copy(), scale, tie
