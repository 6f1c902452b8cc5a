"""IDW gridding invariants: numpy replication, ring coverage, exact-hit
regularization, world-edge guard, partition invariance."""
import numpy as np
import pytest

from terraspark import cells, gridding


def _pts(spark, rows):
    return spark.createDataFrame(rows, "lat double, lon double, value double")


def _numpy_idw(rows, res, k, s=1e-3):
    size = cells.cell_size_deg(res)
    out = {}
    for lat, lon, v in rows:
        ilat = int(np.floor((lat + 90.0) / size))
        ilon = int(np.floor((lon + 180.0) / size))
        for di in range(-k, k + 1):
            for dj in range(-k, k + 1):
                jlat, jlon = ilat + di, ilon + dj
                if not (0 <= jlat < 180 * 2**res
                        and 0 <= jlon < 360 * 2**res):
                    continue
                cell = res * 2**56 + jlat * 2**28 + jlon
                clat = jlat * size - 90.0 + size / 2.0
                clon = jlon * size - 180.0 + size / 2.0
                w = 1.0 / ((lat - clat) ** 2 + (lon - clon) ** 2 + s * s)
                n, wv, ws = out.get(cell, (0, 0.0, 0.0))
                out[cell] = (n + 1, wv + w * v, ws + w)
    return {c: (n, round(wv / ws, 6)) for c, (n, wv, ws) in out.items()}


def test_matches_numpy_model(spark):
    rows = [(10.001, 20.002, 5.0), (10.004, 20.001, 9.0),
            (-33.3, 151.2, 42.0)]
    got = {r["cell"]: (r["n_pts"], r["value"]) for r in
           gridding.idw_grid(_pts(spark, rows), res=7, k_ring=2).collect()}
    assert got == _numpy_idw(rows, 7, 2)


def test_single_point_ring_coverage_and_peak(spark):
    rows = [(0.0039, 0.0039, 7.0)]   # cell center at res 7 (size 1/128)
    got = {r["cell"]: r for r in
           gridding.idw_grid(_pts(spark, rows), res=7, k_ring=1).collect()}
    assert len(got) == 9             # full 3x3 ring
    # exact hit: every cell's estimate is exactly the point value (one
    # contributor), and the center cell is where the point lives
    assert all(r["value"] == 7.0 and r["n_pts"] == 1 for r in got.values())
    center = 7 * 2**56 + (90 * 128) * 2**28 + (180 * 128)
    assert center in got


def test_world_edge_guard(spark):
    # a point in the top-right corner cell: ring cells past the +90/+180
    # edge are dropped, not wrapped
    size = cells.cell_size_deg(7)
    rows = [(90.0 - size / 2, 180.0 - size / 2, 1.0)]
    got = gridding.idw_grid(_pts(spark, rows), res=7, k_ring=1).collect()
    assert len(got) == 4             # 2x2 corner of the 3x3 ring survives


def test_partition_invariance(spark):
    rows = [(float(10 + (i * 7 % 23) * 0.37), float(20 + (i * 11 % 19)
             * 0.53), float(100 + i * i)) for i in range(12)]
    a = {r["cell"]: (r["n_pts"], r["value"]) for r in gridding.idw_grid(
        _pts(spark, rows).repartition(1), res=7).collect()}
    b = {r["cell"]: (r["n_pts"], r["value"]) for r in gridding.idw_grid(
        _pts(spark, rows).repartition(7, "value"), res=7).collect()}
    assert a == b
