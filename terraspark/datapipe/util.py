"""Shared datapipe input-shape guards."""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
    # JVM-side partition probe: df.rdd would spin up the Python-RDD
    # serializer machinery just to read a number
    if df._jdf.rdd().getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df


def key_skew_audit(df, key_col: str, top: int = 10):
    """Join-key skew profiler: the diagnostic a planner (or an engineer
    sizing a 1000-executor job) reads before shuffling on ``key_col`` --
    heavy-hitter keys with their share of the table and their ratio to
    the mean key frequency (the straggler factor a plain hash join
    would suffer; >> 1 means salt this key or let AQE split it).

    Returns the ``top`` heaviest keys (count desc, key asc):
    (key, n_rows, share, skew).  Shape: one map-side-combinable count
    per key, a single-row global summary broadcast back, and a top-k
    over the already-reduced per-key table (rows = distinct keys, far
    smaller than the input; a two-level top-k is unnecessary here
    because the count table IS the reduction)."""
    from pyspark.sql import Window, functions as F
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n_rows"))
    tot = counts.agg(F.sum("n_rows").cast("double").alias("N"),
                     F.avg("n_rows").alias("avg_n"))
    # non-foldable always-zero partition key (the rel_rank_topk trick)
    # keeps Spark from logging 'No Partition Defined' -- the counts
    # table is already reduced, so the single partition is intended
    w = Window.partitionBy(F.pmod(F.hash("key"), F.lit(1))) \
        .orderBy(F.desc("n_rows"), F.asc("key"))
    return (counts.crossJoin(F.broadcast(tot))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= top)
            .select(F.col("rnk").cast("int").alias("rnk"), "key", "n_rows",
                    F.round(F.col("n_rows") / F.col("N"), 6).alias("share"),
                    F.round(F.col("n_rows") / F.col("avg_n"), 4)
                    .alias("skew")))


def md5_bucket8(sql_expr: str):
    """0..255 bucket from the first two hex digits of an md5-hex SQL
    expression -- the repo's portable hash convention: pure ANSI
    instr/substr arithmetic that every DuckDB oracle reproduces
    verbatim (hll_distinct registers, count-min rows, DSIR features).
    ``sql_expr`` must be a SQL fragment yielding the md5 hex string.
    """
    hexd = "0123456789abcdef"
    return ((F.expr(f"instr('{hexd}', substr({sql_expr}, 1, 1))") - 1) * 16
            + (F.expr(f"instr('{hexd}', substr({sql_expr}, 2, 1))") - 1))
