"""Shared datapipe input-shape guards."""
from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition a narrow input whose scan cannot keep the cores busy.

    Small single-file parquet scans (the fixture/benchmark shape) yield
    ONE input split, which serializes every downstream explode/hash
    stage onto one task no matter how many cores the session has -- the
    same trap tile_images guards against for image bytes.  A
    production-scale scan already has >= cores natural splits, so this
    is a no-op there (the guard only fires when the scan is NARROWER
    than the core count, and what it shuffles is the small input).
    Streaming plans cannot inspect partitioning and pass through.
    """
    if df.isStreaming:
        return df
    spark = df.sparkSession
    if min_parts is None:
        min_parts = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df
