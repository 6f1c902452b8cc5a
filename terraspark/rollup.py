"""Hierarchical cell rollup: per-cell statistics re-aggregated up the
spatial index (res R -> R-1 -> ... -> R-L), the hypertable / continuous-
aggregate pattern for multi-resolution raster serving.

The reference evaluates metrics at one fixed scene resolution; at 10^12-
image scale a user asks the same statistics at coarser zoom levels, and
recomputing each level from raw pixels would rescan the corpus L times.
Here every level is derived from the PREVIOUS level's mergeable partials
(count / sum / sum-of-squares / min / max), so the whole pyramid costs L
tiny re-aggregations over already-reduced data -- each groupBy input is
4x smaller than the last (the log-style rollup used by every OLAP cube).

Parent arithmetic is pure JVM bit math on the int64 cell key
(terraspark.cells layout [res:6][ilat:28][ilon:28]): parent(cell) =
res-1, ilat>>1, ilon>>1 -- no Python in the plan, and the identical
expressions run verbatim in the SQL oracle (DuckDB), so the rollup logic
itself is cross-checked, not just its inputs.

Scale shape: each level is one shuffle on the (already tiny) parent key
domain with map-side combine; no level ever touches pixel data.  Skewed
cells (many tiles stacked on one anchor) are reduced at level 0 before
any rollup shuffle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LAT_BITS = 28
_LON_BITS = 28
_MASK = (1 << _LAT_BITS) - 1


def cell_res(cell):
    """int64 cell key -> resolution (JVM expression)."""
    return F.shiftright(cell, _LAT_BITS + _LON_BITS)


def parent_cell(cell):
    """One-level-up parent key (JVM bit math; see terraspark.cells layout).

    World-edge note: ilat/ilon halving can never carry across fields --
    both are non-negative and shrink, so the 28-bit lanes cannot overflow.
    """
    res = F.shiftright(cell, _LAT_BITS + _LON_BITS)
    ilat = F.shiftright(cell, _LON_BITS).bitwiseAND(F.lit(_MASK))
    ilon = cell.bitwiseAND(F.lit(_MASK))
    return (F.shiftleft(res - 1, _LAT_BITS + _LON_BITS)
            .bitwiseOR(F.shiftleft(F.shiftright(ilat, 1), _LON_BITS))
            .bitwiseOR(F.shiftright(ilon, 1)))


# mergeable partial columns the rollup re-aggregates
PARTIALS = ("n", "s", "ss", "vmin", "vmax")


def _merge(df: DataFrame, keys: list[str]) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.sum("n").alias("n"), F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax"))


def rollup_levels(base: DataFrame, levels: int,
                  group_cols: tuple[str, ...] = ("band",)) -> DataFrame:
    """base(cell, *group_cols, n, s, ss, vmin, vmax) at res R ->
    union of levels R..R-levels with the same schema plus ``res``.

    Level i+1 aggregates level i's partials under the parent key -- never
    the raw data -- so the full pyramid is L cheap shuffles over
    geometrically shrinking inputs.
    """
    cur = _merge(base, ["cell", *group_cols])
    out = cur.withColumn("res", cell_res(F.col("cell")).cast("int"))
    for _ in range(levels):
        cur = _merge(cur.withColumn("cell", parent_cell(F.col("cell"))),
                     ["cell", *group_cols])
        out = out.unionByName(
            cur.withColumn("res", cell_res(F.col("cell")).cast("int")))
    return out


def rollup_stats(base: DataFrame, levels: int,
                 group_cols: tuple[str, ...] = ("band",),
                 round_to: int = 4) -> DataFrame:
    """Finalized pyramid: (res, cell, *group_cols, n, mean, std, vmin,
    vmax) -- mean/std derived from the merged partials at every level."""
    lv = rollup_levels(base, levels, group_cols)
    mean = F.col("s") / F.col("n")
    var = F.col("ss") / F.col("n") - mean * mean
    return lv.select(
        "res", "cell", *group_cols, "n",
        F.round(mean, round_to).alias("mean"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), round_to).alias("std"),
        F.round("vmin", round_to).alias("vmin"),
        F.round("vmax", round_to).alias("vmax"))


def parent_sql(col: str) -> str:
    """The identical parent arithmetic as portable SQL (oracle side)."""
    res = f"({col} >> 56)"
    ilat = f"(({col} >> 28) & {_MASK})"
    ilon = f"({col} & {_MASK})"
    return (f"((({res} - 1) << 56) | (({ilat} >> 1) << 28) "
            f"| ({ilon} >> 1))")
