"""Deterministic H3/S2-like spatial cell index (pure numpy, no native deps).

The north rule requires H3/S2 cell keys assigned by *batched vectorized
encode*, ring/kNN neighbor queries, and polygon->cell covers for
point-in-polygon containment joins.  The real ``h3`` package is not in this
container, so we provide an equivalent hierarchical lat/lon grid index with
the same API shape:

* ``encode(lat, lon, res)``  -> int64 cell key (vectorized)
* ``ring(cell, k)``          -> all cells within Chebyshev distance k
  (grid_disk analogue)
* ``cover_bbox / cover_wkt`` -> cell cover of a polygon (polyfill analogue)
* ``cell_center(cell)``      -> (lat, lon)

Key layout (int64):  [res:6 bits][ilat:28 bits][ilon:28 bits]
ilat = floor((lat + 90) / size), ilon = floor((lon + 180) / size),
size = 1/2**res degrees.  At res<=20 the indices fit comfortably.

If the ``h3`` library is available it could be swapped in behind this same
API; all engine code goes through this module.
"""
from __future__ import annotations

import re

import numpy as np

_LAT_BITS = 28
_LON_BITS = 28
_MAX_RES = 20


def cell_size_deg(res: int) -> float:
    return 1.0 / (1 << res)


def encode(lat, lon, res: int):
    """Vectorized lat/lon -> int64 cell key."""
    if not 0 <= res <= _MAX_RES:
        raise ValueError(f"res out of range: {res}")
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    size = cell_size_deg(res)
    ilat = np.clip(np.floor((lat + 90.0) / size).astype(np.int64),
                   0, (180 << res) - 1)
    ilon = np.clip(np.floor((lon + 180.0) / size).astype(np.int64),
                   0, (360 << res) - 1)
    return (np.int64(res) << (_LAT_BITS + _LON_BITS)) | (ilat << _LON_BITS) | ilon


def decode(cell):
    """int64 cell key -> (res, ilat, ilon) arrays."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> (_LAT_BITS + _LON_BITS)
    ilat = (cell >> _LON_BITS) & ((1 << _LAT_BITS) - 1)
    ilon = cell & ((1 << _LON_BITS) - 1)
    return res, ilat, ilon


def from_indices(res, ilat, ilon):
    res = np.asarray(res, dtype=np.int64)
    ilat = np.asarray(ilat, dtype=np.int64)
    ilon = np.asarray(ilon, dtype=np.int64)
    return (res << (_LAT_BITS + _LON_BITS)) | (ilat << _LON_BITS) | ilon


def cell_center(cell):
    res, ilat, ilon = decode(cell)
    size = 1.0 / (1 << res.astype(np.int64)) if isinstance(res, np.ndarray) else cell_size_deg(int(res))
    if isinstance(res, np.ndarray):
        size = 1.0 / np.power(2.0, res.astype(np.float64))
    lat = (ilat.astype(np.float64) + 0.5) * size - 90.0
    lon = (ilon.astype(np.float64) + 0.5) * size - 180.0
    return lat, lon


def ring(cell: int, k: int = 1, include_center: bool = True) -> np.ndarray:
    """grid_disk analogue: all cells with Chebyshev distance <= k.

    Fills the reference's missing neighbor-context operator (SURVEY.md J5):
    used for slope/aspect halo exchange and kNN context queries.
    """
    res, ilat, ilon = decode(np.int64(cell))
    res = int(res)
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dlat, dlon = np.meshgrid(offs, offs, indexing="ij")
    dlat, dlon = dlat.ravel(), dlon.ravel()
    if not include_center:
        keep = ~((dlat == 0) & (dlon == 0))
        dlat, dlon = dlat[keep], dlon[keep]
    return from_indices(res, int(ilat) + dlat, int(ilon) + dlon)


def ring_offsets_vectorized(cells: np.ndarray, k: int = 1):
    """For an array of N cells return (N*(2k+1)^2,) neighbor keys plus the
    (dlat, dlon) offset of each neighbor -- used to tag halo strips."""
    cells = np.asarray(cells, dtype=np.int64)
    res, ilat, ilon = decode(cells)
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dlat, dlon = np.meshgrid(offs, offs, indexing="ij")
    dlat, dlon = dlat.ravel(), dlon.ravel()
    n, m = cells.shape[0], dlat.shape[0]
    nlat = ilat[:, None] + dlat[None, :]
    nlon = ilon[:, None] + dlon[None, :]
    keys = from_indices(int(res[0]) if n else 0, nlat.ravel(), nlon.ravel())
    return (
        keys.reshape(n, m),
        np.broadcast_to(dlat, (n, m)),
        np.broadcast_to(dlon, (n, m)),
    )


_WKT_RE = re.compile(r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?")


def _wkt_points(wkt: str) -> np.ndarray:
    nums = np.array([float(x) for x in _WKT_RE.findall(wkt)], dtype=np.float64)
    return nums.reshape(-1, 2)  # (lon, lat) pairs, WKT axis order


def cover_bbox(lat_min: float, lat_max: float, lon_min: float, lon_max: float,
               res: int) -> np.ndarray:
    """All cells intersecting the bbox (polyfill analogue for rectangles)."""
    size = cell_size_deg(res)
    la0 = int(np.floor((lat_min + 90.0) / size))
    la1 = int(np.floor((lat_max + 90.0) / size))
    lo0 = int(np.floor((lon_min + 180.0) / size))
    lo1 = int(np.floor((lon_max + 180.0) / size))
    ilat, ilon = np.meshgrid(
        np.arange(la0, la1 + 1, dtype=np.int64),
        np.arange(lo0, lo1 + 1, dtype=np.int64),
        indexing="ij",
    )
    return from_indices(res, ilat.ravel(), ilon.ravel())


def cover_wkt(wkt: str, res: int) -> np.ndarray:
    """Cell cover of a WKT POLYGON.

    Candidate cells come from the bbox; each candidate's center is then
    point-in-polygon tested (even-odd ray cast, vectorized) so non-rectangular
    polygons are covered correctly (center-containment semantics, matching
    how tile centers are assigned to cells).
    """
    pts = _wkt_points(wkt)
    lons, lats = pts[:, 0], pts[:, 1]
    cand = cover_bbox(lats.min(), lats.max(), lons.min(), lons.max(), res)
    clat, clon = cell_center(cand)
    inside = points_in_polygon(clat, clon, pts)
    return cand[inside]


def points_in_polygon(lat, lon, poly_pts: np.ndarray) -> np.ndarray:
    """Vectorized even-odd point-in-polygon (poly_pts = (lon, lat) rows)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    x, y = lon, lat
    px, py = poly_pts[:, 0], poly_pts[:, 1]
    n = len(px)
    inside = np.zeros(x.shape, dtype=bool)
    j = n - 1
    for i in range(n):
        xi, yi, xj, yj = px[i], py[i], px[j], py[j]
        cond = ((yi > y) != (yj > y)) & (
            x < (xj - xi) * (y - yi) / ((yj - yi) if yj != yi else 1e-300) + xi
        )
        inside ^= cond
        j = i
    return inside
