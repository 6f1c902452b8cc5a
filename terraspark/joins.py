"""Spatial join operators: point-in-polygon (AOI containment) and kNN ring.

The reference's classification join masks every band by a group-id raster
(/root/reference/processing_alg/topocorrection_eval/eval.py:134-141,173-179).
Here classification zones are polygons: each AOI row carries a precomputed
H3-like cell cover (``cells`` array, the polyfill pattern), so
point-in-polygon becomes cell-key containment:

    tiles JOIN explode(aoi.cells) ON tile.cell == aoi_cell

The exploded cover is tiny (thousands of cells) -> broadcast hash join, no
shuffle, skew-immune on the probe side.  Tiles matching no polygon are
dropped, mirroring the reference's NaN-group filter (eval.py:137).

kNN ring context (SURVEY.md J5, a north-rule addition the reference lacks):
``ring_join`` attaches to every tile the tiles of its ring-k neighborhood
via a self-equi-join on neighbor cell keys generated map-side.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aoi_cover(aoi: DataFrame) -> DataFrame:
    """aoi(aoi_id, name, polygon, cells) -> (aoi_id, cell) exploded cover."""
    return aoi.select("aoi_id", F.explode("cells").alias("cell"))


def aoi_containment_join(tiles: DataFrame, aoi: DataFrame,
                         how: str = "inner") -> DataFrame:
    """Attach group_id (aoi_id) to tile rows by cell containment."""
    cover = F.broadcast(aoi_cover(aoi))
    return tiles.join(cover, "cell", how).withColumnRenamed("aoi_id", "group_id")


class IncompatibleRastersError(ValueError):
    """Image tiles found no matching DEM cell (misaligned inputs)."""


def check_compatible(tiles: DataFrame, dem_features: DataFrame,
                     strict: bool = True) -> DataFrame:
    """Input-compatibility validation, the engine analogue of the
    reference's ``check_compatible`` (raises on CRS/extent/size mismatch,
    /root/reference/util/qgis_utils.py:81-95).  The equi-join on the cell
    key would otherwise SILENTLY drop tiles whose cell has no DEM row; a
    misaligned DEM should be a loud error, not quietly-missing outputs.

    Returns per-image uncovered-tile counts (the audit surface).  With
    ``strict=True`` raises IncompatibleRastersError when any tile is
    uncovered, naming the worst offenders."""
    missing = tiles.join(dem_features.select("cell"), "cell", "left_anti")
    audit = (missing.groupBy("image_id")
             .agg(F.count("*").alias("uncovered_tiles")))
    if strict:
        worst = audit.orderBy(F.desc("uncovered_tiles")).limit(10).collect()
        if worst:
            detail = ", ".join(f"{r['image_id']}={r['uncovered_tiles']}"
                               for r in worst)
            raise IncompatibleRastersError(
                f"tiles with no DEM coverage (image=count): {detail}")
    return audit


def write_bucketed(df: DataFrame, table: str, buckets: int = 64,
                   key: str = "cell") -> None:
    """Persist a table bucketed (and sorted) by the cell key.

    Pre-bucketing both sides of a recurring join on the same key count
    makes the join co-located: Spark's bucketed scan satisfies the join's
    distribution requirement, so the sort-merge join runs with NO exchange
    (verified by plan assertion in tests/test_bucketed_join.py).  This is
    the cheapest repeat-join strategy when the DEM side outgrows broadcast
    range -- bucket once, join every correction run shuffle-free."""
    (df.write.mode("overwrite").format("parquet")
       .bucketBy(buckets, key).sortBy(key).saveAsTable(table))


def ring_join(tiles: DataFrame, k: int = 1,
              neighbor_cols: tuple = ("cell", "px"),
              salt_buckets: int = 0) -> DataFrame:
    """Self-join: each tile row gains its ring-k neighbor tiles (same image,
    same band).  Neighbor keys are generated map-side with the vectorized
    cell index (no UDF shuffle fan-out beyond the (2k+1)^2 factor).

    ``salt_buckets > 0`` pre-splits hot cells: the build side is exploded
    with a salt column and the probe side draws a random salt, bounding the
    per-task fan-in on FIXTURES.md's deliberately skewed anchor cell.  With
    0, AQE's skew-join splitting is left to handle it (both paths tested).
    """
    from .cells import _LAT_BITS, _LON_BITS  # key layout

    offs = [(dla, dlo) for dla in range(-k, k + 1) for dlo in range(-k, k + 1)]
    neighbor_keys = F.array(*[
        (F.col("cell") + F.lit((dla << _LON_BITS) + dlo)).cast("long")
        for dla, dlo in offs
    ])
    probe = tiles.withColumn("nbr_cell", F.explode(neighbor_keys))
    build = tiles.select(
        F.col("image_id").alias("n_image_id"),
        F.col("band").alias("n_band"),
        *[F.col(c).alias(f"n_{c}") for c in neighbor_cols if c != "cell"],
        F.col("cell").alias("nbr_cell"),
    )
    if salt_buckets > 0:
        build = build.withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
        probe = probe.withColumn(
            "salt", (F.pmod(F.hash("image_id", "tile_x", "tile_y"),
                            F.lit(salt_buckets))).cast("int"))
        cond = ["nbr_cell", "salt"]
    else:
        cond = ["nbr_cell"]
    joined = probe.join(
        build,
        on=[*cond],
        how="inner",
    ).where(
        (F.col("image_id") == F.col("n_image_id"))
        & (F.col("band") == F.col("n_band"))
    )
    return joined.drop("n_image_id", "n_band", *(["salt"] if salt_buckets else []))


def polyfill(aoi: DataFrame, res: int, wkt_col: str = "polygon",
             id_col: str = "aoi_id") -> DataFrame:
    """Distributed polyfill: (id, cell) cover computed FROM the WKT
    polygon itself -- the operator form of the driver-side
    :func:`terraspark.cells.cover_wkt` (bit-identical semantics, proven
    in tests/test_joins.py).

    Per polygon row, entirely in JVM expressions: parse the WKT numbers
    (regexp_extract_all), take the vertex bbox, explode the candidate
    ilat x ilon ranges (sequence + explode -- work is proportional to
    each polygon's own bbox cell count, so a million small polygons
    parallelize perfectly), then keep candidates whose CELL CENTER
    passes an even-odd ray cast evaluated as an aggregate over the
    vertex edge list.  No Python, no shuffle; the output is the
    (id, cell) cover ready for :func:`aoi_containment_join`.

    At 100 TB scale this is how polygon tables become broadcastable cell
    covers without a geospatial native dependency; one pathological
    continent-sized polygon at high res is the skew case -- bound it by
    res choice or pre-split, the per-row blowup is bbox_cells.
    """
    from terraspark.cells import _LAT_BITS, _LON_BITS, cell_size_deg
    size = cell_size_deg(res)
    num_re = r"-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?"
    nums = F.expr(
        f"transform(regexp_extract_all({wkt_col}, '{num_re}', 0), "
        f"x -> cast(x as double))")
    d = aoi.select(F.col(id_col), nums.alias("_n"))
    d = d.select(
        id_col,
        F.filter("_n", lambda x, i: i % 2 == 0).alias("xs"),   # lons
        F.filter("_n", lambda x, i: i % 2 == 1).alias("ys"))   # lats
    la0 = F.floor((F.array_min("ys") + 90.0) / size).cast("long")
    la1 = F.floor((F.array_max("ys") + 90.0) / size).cast("long")
    lo0 = F.floor((F.array_min("xs") + 180.0) / size).cast("long")
    lo1 = F.floor((F.array_max("xs") + 180.0) / size).cast("long")
    cand = (d.withColumn("ilat", F.explode(F.sequence(la0, la1)))
            .withColumn("ilon", F.explode(F.sequence(lo0, lo1))))
    y = (F.col("ilat").cast("double") + 0.5) * size - 90.0
    x = (F.col("ilon").cast("double") + 0.5) * size - 180.0
    # even-odd ray cast, numpy-identical formulation: edge k pairs
    # vertex k (the "j"/previous point) with vertex k+1 (the "i" point);
    # the guarded divide mirrors cells.points_in_polygon's 1e-300
    cand = cand.withColumn("_y", y).withColumn("_x", x)

    def edge_hit(acc, k):
        xi = F.element_at("xs", (k + 2).cast("int"))
        yi = F.element_at("ys", (k + 2).cast("int"))
        xj = F.element_at("xs", (k + 1).cast("int"))
        yj = F.element_at("ys", (k + 1).cast("int"))
        dy = F.when(yj != yi, yj - yi).otherwise(F.lit(1e-300))
        cond = ((yi > F.col("_y")) != (yj > F.col("_y"))) & \
            (F.col("_x") < (xj - xi) * (F.col("_y") - yi) / dy + xi)
        return acc + F.when(cond, 1).otherwise(0)

    crossings = F.aggregate(
        F.sequence(F.lit(0), F.size("xs") - 2), F.lit(0), edge_hit)
    # fields are disjoint non-negative bit ranges, so + == bitwise OR
    cell = (F.lit(int(res) << (_LAT_BITS + _LON_BITS)).cast("long")
            + F.shiftleft("ilat", _LON_BITS) + F.col("ilon"))
    return (cand.where(crossings % 2 == 1)
            .select(id_col, cell.alias("cell")))
