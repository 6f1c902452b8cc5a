"""Structured Streaming ingest: the correction pipeline as an incremental
job over an append-only image table.

At 10^12-image scale new scenes land continuously; re-running the batch
job over the whole corpus per drop is O(corpus) instead of O(new).  This
module runs the SAME engine stages (decode -> tile -> cell-index -> DEM
join -> scalars -> kernels) inside ``foreachBatch`` of a file-source
stream, so each micro-batch processes only newly-arrived image files.
Exactly-once OUTPUT is the combination of (a) the streaming checkpoint
(WAL + source offsets: a file is delivered to at most one successful
batch) and (b) :func:`write_batch`'s per-batch-id dynamic partition
overwrite (a replayed batch rewrites its own partition instead of
appending) -- foreachBatch alone is only at-least-once.  The streaming
complement to the batch lineage layer (terraspark.lineage.StageRunner).

Correction-method semantics: ALL 11 methods are streaming-safe, including
the regression-based ones (c_correction, veca, teillet, minnaert*, pbc).
The scalar regressions aggregate per (image_id, band) and an image row
never spans micro-batches (the file source delivers whole rows), so
batch-local scalars are IDENTICAL to what the batch engine computes --
not merely approximately: asserted hash-exact for a regression method in
tests/test_streaming.py::test_stream_regression_method_parity.

Design notes for the foreachBatch shape (vs a pure streaming plan):
* the correction pipeline needs two passes over each batch's tiles (scalar
  regression aggregation, then the kernel map) -- a single streaming plan
  cannot re-read its input, foreachBatch can (the standard pattern for
  multi-pass sinks);
* per-(image, band) regression scalars only aggregate pixels of ONE image,
  and an image row never spans micro-batches, so batch-local scalars ==
  global scalars: incremental results are byte-identical to the batch
  engine (asserted in tests/test_streaming.py);
* the DEM feature table is static and tiny -> derived once, persisted,
  broadcast-joined into every batch.

``cell_tile_counts`` shows the native streaming-aggregation path (stateful
groupBy with update-mode state kept by Spark) for monitoring-style rollups
where incremental state IS the product.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import METHODS, CorrectionParams, DEFAULT_PARAMS

# w/h are long: pandas-written parquet stores them as INT64 and the tile
# stage only consumes them scalar-side (never emits them), so the wider
# type is the lossless common denominator for file-source schemas
IMAGES_DDL = ("image_id string, bytes binary, w long, h long, fmt string, "
              "caption string, phash long")


def write_batch(corrected: DataFrame, batch_id: int, out_dir: str) -> None:
    """Idempotent per-batch sink: the micro-batch lands in its OWN
    ``batch_id=<n>`` partition via dynamic partition overwrite, so a
    foreachBatch replay (crash after the parquet commit but before the
    streaming checkpoint records the offset) rewrites the identical
    partition instead of appending duplicate rows -- this is what turns
    foreachBatch's at-least-once redelivery into exactly-once OUTPUT
    (tests/test_streaming.py::test_batch_write_idempotent)."""
    (corrected.withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(out_dir))


def stream_correct(spark: SparkSession, images_dir: str, scenes_df,
                   dem_df, out_dir: str, checkpoint_dir: str,
                   methods=("cosine_t",),
                   params: CorrectionParams = DEFAULT_PARAMS,
                   max_files_per_trigger: int | None = None):
    """Incremental correction over a directory of image parquet files.

    Runs with ``availableNow`` trigger: drains everything not yet recorded
    in the checkpoint, then stops -- re-invoking after new files arrive
    processes ONLY the new ones (exactly-once via the streaming WAL).
    Returns the finished StreamingQuery.
    """
    from terraspark import corrections
    from terraspark.pipeline import TopoEngine

    unknown = [m for m in methods if m not in METHODS]
    if unknown:
        raise ValueError(f"unknown methods: {unknown}")

    eng = TopoEngine(spark, params=params)
    feats = eng.dem_features(dem_df)          # static dim, derived once
    feats.count()                             # materialize the persist

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        tiles = eng.tiles(batch_df, scenes_df)
        joined = corrections.join_dem(tiles, feats).persist()
        try:
            sc = corrections.band_stats_df(joined, params, eng.tile)
            corrected = corrections.apply_corrections(
                joined, sc, methods, params, eng.tile)
            write_batch(corrected, batch_id, out_dir)
        finally:
            joined.unpersist()

    reader = (spark.readStream.schema(IMAGES_DDL)
              .option("recursiveFileLookup", "false"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(images_dir)

    q = (stream.writeStream
         .foreachBatch(process_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def cell_tile_counts(spark: SparkSession, images_dir: str, scenes_df,
                     checkpoint_dir: str, query_name: str = "cell_counts",
                     cell_res: int | None = None):
    """Native stateful streaming aggregation: tiles-per-cell counts kept as
    Spark streaming state (update mode -> in-memory sink for inspection;
    at scale the sink would be an upsertable store).

    Demonstrates the pure-streaming plan (readStream -> mapInPandas decode
    -> groupBy state) as opposed to the foreachBatch multi-pass shape.
    Returns the finished StreamingQuery; read results from the
    ``query_name`` in-memory table."""
    from terraspark import tiling
    from terraspark.config import CELL_RES

    stream = spark.readStream.schema(IMAGES_DDL).parquet(images_dir)
    tiles = tiling.tile_images(stream, scenes_df,
                               cell_res=cell_res or CELL_RES,
                               input_partitions=1)
    counts = tiles.groupBy("cell").agg(F.count("*").alias("n_tiles"))
    q = (counts.writeStream
         .outputMode("complete")
         .format("memory")
         .queryName(query_name)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def stream_cell_rollup(spark: SparkSession, images_dir: str, scenes_df,
                       dem_df, out_dir: str, checkpoint_dir: str,
                       method: str = "cosine_t",
                       params: CorrectionParams = DEFAULT_PARAMS):
    """Streaming continuous aggregate (the hypertable-rollup pattern,
    incremental form): each micro-batch reduces its OWN images to
    per-cell MERGEABLE partials (n, s, ss, vmin, vmax -- the same
    partials the batch pyramid is built from) and lands them in its own
    ``batch_id`` partition exactly-once (write_batch); the materialized
    aggregate is recovered any time by :func:`merged_cell_rollup`'s
    single groupBy merge.

    This is the scale shape for continuous aggregation over 10^12
    images: state is O(cells), merges are associative sums, and a
    replayed batch overwrites its own partition, so the aggregate never
    double-counts.  Per-batch partials are exact (not approximate)
    because cell partials are pure sums over each image's own tiles and
    an image never spans micro-batches."""
    from terraspark import corrections, sinks
    from terraspark.pipeline import TopoEngine

    if method not in METHODS:
        raise ValueError(f"unknown method: {method}")

    eng = TopoEngine(spark, params=params)
    feats = eng.dem_features(dem_df)
    feats.count()

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        tiles = eng.tiles(batch_df, scenes_df)
        joined = corrections.join_dem(tiles, feats).persist()
        try:
            sc = corrections.band_stats_df(joined, params, eng.tile)
            corrected = corrections.apply_corrections(
                joined, sc, (method,), params, eng.tile)
            partials = sinks.cell_partials(corrected).drop("method")
            write_batch(partials, batch_id, out_dir)
        finally:
            joined.unpersist()

    stream = spark.readStream.schema(IMAGES_DDL).parquet(images_dir)
    q = (stream.writeStream
         .foreachBatch(process_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def merged_cell_rollup(spark: SparkSession, out_dir: str,
                       round_to: int = 4) -> DataFrame:
    """Merge the streamed per-batch partials into the finalized
    continuous aggregate: (cell, band, n, mean, std, vmin, vmax).
    One map-side-combinable groupBy over partial rows -- identical
    merge arithmetic to the batch rollup (terraspark.rollup)."""
    p = spark.read.parquet(out_dir).drop("batch_id")
    m = p.groupBy("cell", "band").agg(
        F.sum("n").cast("long").alias("n"), F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax"))
    mean = F.col("s") / F.col("n")
    var = F.col("ss") / F.col("n") - mean * mean
    return m.select(
        "cell", "band", "n",
        F.round(mean, round_to).alias("mean"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), round_to).alias("std"),
        F.round("vmin", round_to).alias("vmin"),
        F.round("vmax", round_to).alias("vmax"))
