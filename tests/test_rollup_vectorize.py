"""Hierarchical cell rollup + raster->vector polygonize (distributed CC).

Both operators are checked against independent in-test models:
  * rollup vs a pandas recomputation from the base partials;
  * connected components vs a hand-rolled BFS over the same active set.
"""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from terraspark import cells, rollup, vectorize

MASK = (1 << 28) - 1


def _key(res, ilat, ilon):
    return (np.int64(res) << 56) | (np.int64(ilat) << 28) | np.int64(ilon)


@pytest.fixture(scope="module")
def base_stats(spark):
    """Synthetic per-cell partials at res 7 on a known grid."""
    rng = np.random.default_rng(7)
    ilat0, ilon0 = 12000, 24000
    rows = []
    for dy in range(8):
        for dx in range(8):
            v = rng.normal(100 + 10 * dy, 5, size=16)
            rows.append({
                "cell": int(_key(7, ilat0 + dy, ilon0 + dx)),
                "band": int(dx % 2),
                "n": 16, "s": float(v.sum()), "ss": float((v * v).sum()),
                "vmin": float(v.min()), "vmax": float(v.max()),
            })
    pdf = pd.DataFrame(rows)
    return pdf, spark.createDataFrame(
        pdf, "cell long, band int, n long, s double, ss double, "
             "vmin double, vmax double")


class TestRollup:
    def test_parent_arithmetic_matches_encode(self, spark):
        # parent(encode(p, res)) == encode(p, res-1) for random points
        rng = np.random.default_rng(3)
        lat = rng.uniform(-80, 80, 64)
        lon = rng.uniform(-170, 170, 64)
        fine = cells.encode(lat, lon, 9)
        coarse = cells.encode(lat, lon, 8)
        df = spark.createDataFrame(
            pd.DataFrame({"cell": fine.astype("int64")}), "cell long")
        got = df.select(rollup.parent_cell(F.col("cell")).alias("p")) \
            .toPandas()["p"].to_numpy()
        assert (np.sort(got) == np.sort(coarse.astype("int64"))).all()

    def test_levels_match_pandas_model(self, spark, base_stats):
        pdf, df = base_stats
        got = rollup.rollup_stats(df, levels=2).toPandas()

        # independent model: recompute each level from the BASE via numpy
        def parent(c, k):
            res = c >> 56
            ilat = (c >> 28) & MASK
            ilon = c & MASK
            return ((res - k) << 56) | ((ilat >> k) << 28) | (ilon >> k)

        for lvl in (0, 1, 2):
            p = pdf.copy()
            p["cell"] = parent(p["cell"].to_numpy(np.int64), lvl)
            g = p.groupby(["cell", "band"]).agg(
                n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum"),
                vmin=("vmin", "min"), vmax=("vmax", "max")).reset_index()
            g["mean"] = (g["s"] / g["n"]).round(4)
            var = g["ss"] / g["n"] - (g["s"] / g["n"]) ** 2
            g["std"] = np.sqrt(np.maximum(var, 0)).round(4)
            sub = got[got["res"] == 7 - lvl]
            assert len(sub) == len(g), f"level {lvl} row count"
            m = sub.merge(g, on=["cell", "band"], suffixes=("", "_exp"))
            assert len(m) == len(g)
            assert (m["n"] == m["n_exp"]).all()
            assert np.allclose(m["mean"], m["mean_exp"])
            assert np.allclose(m["std"], m["std_exp"])
            assert np.allclose(m["vmin"], m["vmin_exp"].round(4))
            assert np.allclose(m["vmax"], m["vmax_exp"].round(4))

    def test_rollup_plan_has_no_python(self, spark, base_stats):
        _, df = base_stats
        plan = rollup.rollup_stats(df, levels=2) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan


def _bfs_components(active_set):
    """Independent BFS over (ilat, ilon) positions -> {pos: min_key}."""
    comp = {}
    for start in sorted(active_set):
        if start in comp:
            continue
        seen, stack = set(), [start]
        while stack:
            p = stack.pop()
            if p in seen:
                continue
            seen.add(p)
            y, x = p
            stack += [q for q in ((y - 1, x), (y + 1, x), (y, x - 1),
                                  (y, x + 1))
                      if q in active_set and q not in seen]
        root = min(seen)
        comp.update({p: root for p in seen})
    return comp


class TestPolygonize:
    @pytest.fixture(scope="class")
    def means(self, spark):
        """An L-shape, a 2x2 block, an isolated cell, plus inactive cells."""
        ilat0, ilon0 = 13000, 26000
        shape = {(0, 0), (1, 0), (2, 0), (2, 1), (2, 2),       # L (5 cells)
                 (5, 5), (5, 6), (6, 5), (6, 6),               # block
                 (0, 7)}                                       # singleton
        rows = []
        for dy in range(8):
            for dx in range(8):
                rows.append({
                    "cell": int(_key(7, ilat0 + dy, ilon0 + dx)),
                    "mean": 10.0 if (dy, dx) in shape else 1.0})
        pdf = pd.DataFrame(rows)
        return (shape, ilat0, ilon0,
                spark.createDataFrame(pdf, "cell long, mean double"))

    def test_components_match_bfs(self, spark, means):
        shape, ilat0, ilon0, df = means
        got = vectorize.polygonize(df, threshold=5.0).toPandas()
        active = {(ilat0 + dy, ilon0 + dx) for dy, dx in shape}
        model = _bfs_components(active)
        exp_groups = {}
        for pos, root in model.items():
            exp_groups.setdefault(int(_key(7, *root)), set()).add(pos)
        assert set(got["component"]) == set(exp_groups)
        sizes = dict(zip(got["component"], got["n_cells"]))
        assert sizes == {k: len(v) for k, v in exp_groups.items()}

    def test_bbox_and_wkt(self, spark, means):
        shape, ilat0, ilon0, df = means
        got = vectorize.polygonize(df, threshold=5.0).toPandas()
        size = 1.0 / 128
        # the 2x2 block component: rows 5-6, cols 5-6
        block_root = int(_key(7, ilat0 + 5, ilon0 + 5))
        r = got[got["component"] == block_root].iloc[0]
        assert r["lat_min"] == (ilat0 + 5) * size - 90.0
        assert r["lat_max"] == (ilat0 + 7) * size - 90.0
        assert r["lon_min"] == (ilon0 + 5) * size - 180.0
        assert r["lon_max"] == (ilon0 + 7) * size - 180.0
        assert r["wkt"].startswith("POLYGON((") and r["wkt"].count(",") == 4
        assert f"{r['lon_min']:.7f} {r['lat_min']:.7f}" in r["wkt"]

    def test_converges_on_long_chain(self, spark):
        """A 40-cell snake needs label propagation over diameter 40 --
        pointer jumping must converge well under the iteration cap."""
        ilat0, ilon0 = 14000, 28000
        pos = []
        y = x = 0
        for i in range(40):                   # serpentine path
            pos.append((y, x))
            if i % 10 == 9:
                y += 1
            elif (y % 2) == 0:
                x += 1
            else:
                x -= 1
        pdf = pd.DataFrame({
            "cell": [int(_key(7, ilat0 + dy, ilon0 + 10 + dx))
                     for dy, dx in pos],
            "mean": 10.0})
        df = spark.createDataFrame(pdf, "cell long, mean double")
        got = vectorize.polygonize(df, threshold=5.0, max_iter=12).toPandas()
        assert len(got) == 1
        assert got["n_cells"].iloc[0] == 40
