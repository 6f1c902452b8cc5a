"""Raster -> vector: polygonize thresholded cell regions via distributed
connected components (the gdal_polygonize analogue, re-expressed as
dataflow -- north rule: raster<->vector conversion).

Pipeline:
  1. per-cell statistic (mean of the band's pixels) -- mergeable partials,
     never an exploded pixel table;
  2. ``active`` cells = statistic > threshold (the raster mask);
  3. 4-adjacency edges between active cells, generated with pure JVM bit
     math on the int64 cell key (east = ilon+1 = cell+1 within the same
     ilat lane; south = ilat+1 = cell + 2^28) -- no Python, no geometry
     library;
  4. connected components by iterative min-label propagation WITH pointer
     jumping (label <- min(own, neighbors' labels, label's label)): the
     plain neighbor-min loop needs O(diameter) rounds, path-halving makes
     it O(log n) -- the difference between 40 and 7 shuffles on a
     continent-sized region;
  5. each component -> bounding-box polygon (WKT) + cell count.

Every iteration localCheckpoints the label table: iterative Spark plans
otherwise grow lineage linearly and re-execute the whole history each
round (the classic iterative-algorithm trap).

The SQL oracle (see __spark_entry__.oracle_sql, img_polygonize) runs the
IDENTICAL edge arithmetic and a recursive-CTE transitive closure over the
independently-committed numpy-model cell means, so the component logic is
cross-checked end-to-end, not just its inputs.

World-edge guards: cell+1 would wrap into the next ilat lane at ilon =
2^28-1 (lon = +180 deg at res 0) and cell+2^28 would carry into the res
field at ilat = 2^28-1 (lat = +90 deg); both lanes are guarded
symmetrically, with the IDENTICAL predicates in the SQL oracle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LON_BITS = 28
_MASK = (1 << _LON_BITS) - 1
_SOUTH = 1 << _LON_BITS     # +1 in the ilat lane


def _ilat(c):
    return F.shiftright(c, _LON_BITS).bitwiseAND(F.lit(_MASK))


def _ilon(c):
    return c.bitwiseAND(F.lit(_MASK))


def grid_edges(active: DataFrame) -> DataFrame:
    """Symmetric 4-adjacency edges (src, dst) between active cells.

    Two directed half-edge candidates per cell (east, south) are inner-
    joined back to the active set (keeps both-active edges only), then
    mirrored -- 2 narrow shuffles, no N^2 anywhere."""
    c = F.col("cell")
    east = active.select(c.alias("src"), (c + 1).alias("dst")) \
        .where(_ilat(F.col("src")) == _ilat(F.col("dst")))  # wrap guard
    # symmetric wrap guard on the ilat lane: at ilat = 2^28-1 the +2^28
    # would carry into the res field and fabricate a cross-resolution edge
    south = active.select(c.alias("src"), (c + _SOUTH).alias("dst")) \
        .where(F.shiftright(F.col("src"), 2 * _LON_BITS)
               == F.shiftright(F.col("dst"), 2 * _LON_BITS))
    both = east.unionByName(south) \
        .join(active.select(F.col("cell").alias("dst")), "dst")
    return both.select("src", "dst").unionByName(
        both.select(F.col("dst").alias("src"),
                    F.col("src").alias("dst"))).distinct()


def connected_components(active: DataFrame, edges: DataFrame,
                         max_iter: int = 50) -> DataFrame:
    """(cell, label) with label = MIN cell key of the component.

    Min-label propagation + pointer jumping; converges when an iteration
    changes nothing.  Label tables are tiny (one row per active cell, two
    int64 columns) -- the pixel data never enters the loop."""
    labels = active.select("cell", F.col("cell").alias("label")) \
        .localCheckpoint()
    # Scale-adaptive loop partitioning: every round shuffles only the
    # narrow (cell, label) table, whose size is known exactly once the
    # seed table is materialized.  Sizing the loop's shuffles from that
    # count (~500k rows per partition, never above the session default)
    # replaces 32-task micro-stages with 1-2 tasks at fixture scale and
    # still fans out proportionally on a continent-sized region -- the
    # per-round scheduling overhead was the dominant cost of the loop
    # (measured 9 rounds x ~0.4 s for a 2.6k-label table, nearly all
    # task-launch latency).  Restored after the loop so downstream plans
    # keep the session's sizing.
    # the edge table is re-read every round; cut its upstream plan (e.g.
    # polygonize's join+distinct edge derivation) once instead of
    # re-executing it per round -- lazy, so it materializes inside the
    # first round's job
    if not edges.isStreaming:
        edges = edges.localCheckpoint(eager=False)
    spark = active.sparkSession
    key = "spark.sql.shuffle.partitions"
    aqe_key = "spark.sql.adaptive.enabled"
    session_parts = int(spark.conf.get(key))
    session_aqe = spark.conf.get(aqe_key)
    n_nodes = labels.count()
    loop_parts = max(1, min(session_parts, n_nodes // 500_000 + 1))
    spark.conf.set(key, str(loop_parts))
    # AQE re-plans and re-submits every exchange of every round as its own
    # query stage; with the loop's partition count already derived from
    # the exact table size there is nothing left for it to adapt, and its
    # per-round planning latency dominates these micro-stages
    spark.conf.set(aqe_key, "false")
    try:
        labels = _cc_loop(labels, edges, max_iter)
    finally:
        spark.conf.set(key, str(session_parts))
        spark.conf.set(aqe_key, session_aqe)
    return labels


def _cc_loop(labels: DataFrame, edges: DataFrame, max_iter: int,
             steps_per_round: int = 2) -> DataFrame:
    """Min-label + path-halving propagation, ``steps_per_round``
    propagation steps per DRIVER ROUND.

    At fixture scale a round's cost is dominated by the driver barrier
    (plan + schedule + convergence count: measured ~0.17 s gap + ~0.09 s
    job per round vs milliseconds of actual shuffle), so chaining two
    steps into one lazy plan halves the barriers, checkpoints and counts
    for the same total shuffle work; on a cluster the same chaining
    halves the number of synchronization points of the loop.  Semantics
    are unchanged: convergence is declared when the LAST step of a round
    changes nothing (exactly the old one-step criterion -- propagation is
    idempotent at the fixpoint, so any extra step a doubled round runs
    past convergence is a no-op)."""

    def step(cur: DataFrame) -> DataFrame:
        nbr = (edges.withColumnRenamed("src", "cell")
               .join(cur, "cell")
               .select(F.col("dst").alias("cell"), "label",
                       F.lit(False).alias("_own")))
        # The step's input label rides through the SAME union+groupBy as
        # a tagged side-aggregate (each cell has exactly one _own row),
        # so convergence is read off the checkpointed blocks with a plain
        # filter-count -- no separate labels-join (one exchange fewer per
        # step than joining the old table back in).
        merged = (cur.withColumn("_own", F.lit(True)).unionByName(nbr)
                  .groupBy("cell")
                  .agg(F.min("label").alias("label"),
                       F.min(F.when(F.col("_own"), F.col("label")))
                       .alias("old")))
        # pointer jump: every label is itself an active cell, so its own
        # current label exists -- follow it one hop (path halving)
        ptr = merged.select(F.col("cell").alias("label"),
                            F.col("label").alias("jump"))
        return (merged.join(ptr, "label")
                .select("cell", F.least("label", "jump").alias("label"),
                        "old"))

    steps_left = max_iter
    while steps_left > 0:
        n_steps = min(steps_per_round, steps_left)
        steps_left -= n_steps
        cur = labels
        for _ in range(n_steps):
            cur = step(cur.select("cell", "label"))
        # lazy checkpoint: the convergence count below is the round's ONLY
        # action -- it materializes the checkpoint blocks and reads the
        # changed-row count in one job instead of an eager-checkpoint job
        # followed by a count job
        new = cur.localCheckpoint(eager=False)
        changed = new.where(F.col("label") != F.col("old")).count()
        labels = new.select("cell", "label")
        if changed == 0:
            break
    return labels


def polygonize(cell_means: DataFrame, threshold: float,
               max_iter: int = 50) -> DataFrame:
    """cell_means(cell, mean) -> one row per connected above-threshold
    region: (component, n_cells, lat_min/lat_max/lon_min/lon_max, wkt).

    Bounds are cell EDGES (not centers): lat = ilat*size - 90 with
    size = 2^-res degrees -- exact in binary floating point, so the WKT
    string (fixed %.7f) is bit-deterministic on both engine and oracle."""
    active = cell_means.where(F.col("mean") > threshold).select("cell")
    labels = connected_components(active, grid_edges(active), max_iter)
    res = F.shiftright(F.col("label"), 2 * _LON_BITS)
    size = F.lit(1.0) / F.pow(F.lit(2.0), res.cast("double"))
    comp = labels.groupBy("label").agg(
        F.count("*").alias("n_cells"),
        F.min(_ilat(F.col("cell"))).alias("la0"),
        F.max(_ilat(F.col("cell"))).alias("la1"),
        F.min(_ilon(F.col("cell"))).alias("lo0"),
        F.max(_ilon(F.col("cell"))).alias("lo1"))
    lat_min = comp["la0"] * size - 90.0
    lat_max = (comp["la1"] + 1) * size - 90.0
    lon_min = comp["lo0"] * size - 180.0
    lon_max = (comp["lo1"] + 1) * size - 180.0
    wkt = F.format_string(
        "POLYGON((%.7f %.7f, %.7f %.7f, %.7f %.7f, %.7f %.7f, %.7f %.7f))",
        lon_min, lat_min, lon_max, lat_min, lon_max, lat_max,
        lon_min, lat_max, lon_min, lat_min)
    return comp.select(
        F.col("label").alias("component"),
        F.col("n_cells").cast("long").alias("n_cells"),
        lat_min.alias("lat_min"), lat_max.alias("lat_max"),
        lon_min.alias("lon_min"), lon_max.alias("lon_max"),
        wkt.alias("wkt"))
