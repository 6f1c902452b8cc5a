"""Embedding similarity search: brute-force cosine top-k + IVF-bucketed ANN.

Embeddings are ``array<float>`` columns; all math is done in float64 via
JVM-side higher-order functions (zip_with/aggregate -- no Python in the hot
path), bit-compatible with the DuckDB oracle's list_cosine_similarity.

Brute force is the exactness baseline (cross join vs a broadcast query
set); the IVF variant assigns vectors to the nearest of C fixed centroids
(the C lowest vec_ids -- a deterministic 'training' stand-in) and searches
only the query's cell, the standard inverted-file ANN scale path: the
centroid assignment is a broadcast join + argmax, the search a co-partitioned
per-cell top-k.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_double_vec(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("vec", F.transform(F.col(col),
                                            lambda x: x.cast("double")))


def cosine_topk(embeddings: DataFrame, query_ids: list[str] | list[int],
                k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding self).
    Deterministic ordering: (cosine desc, neighbor id asc)."""
    e = with_double_vec(embeddings)
    q = e.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"))
    pairs = e.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id"))
    cos = (_dot(F.col("vec"), F.col("qvec"))
           / (_norm(F.col("vec")) * _norm(F.col("qvec"))))
    scored = pairs.select("query_id", F.col("vec_id").alias("neighbor_id"),
                          cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id",
                    F.round("cos", 6).alias("cos")))


def ivf_assign(embeddings: DataFrame, n_centroids: int = 8) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine; ties by
    centroid id).  Centroids = the n lowest vec_ids (deterministic)."""
    e = with_double_vec(embeddings)
    w_ids = e.select("vec_id").orderBy("vec_id").limit(n_centroids)
    cent = e.join(F.broadcast(w_ids), "vec_id").select(
        F.col("vec_id").alias("centroid_id"), F.col("vec").alias("cvec"))
    cos = (_dot(F.col("vec"), F.col("cvec"))
           / (_norm(F.col("vec")) * _norm(F.col("cvec"))))
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "centroid_id", cos.alias("ccos"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"),
                                             F.asc("centroid_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).select("vec_id", "centroid_id"))


def neardup_pairs(embeddings: DataFrame, threshold: float = 0.8,
                  n_centroids: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by IVF cell: the
    quadratic comparison only runs inside each centroid's bucket (the
    embedding analogue of LSH banding).  Returns (vec_a < vec_b, cos)."""
    assign = ivf_assign(embeddings, n_centroids)
    e = with_double_vec(embeddings).join(assign, "vec_id")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"),
                 "centroid_id")
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"),
                 "centroid_id")
    pairs = a.join(b, "centroid_id").where(F.col("vec_a") < F.col("vec_b"))
    cos = (_dot(F.col("va"), F.col("vb"))
           / (_norm(F.col("va")) * _norm(F.col("vb"))))
    return (pairs.select("vec_a", "vec_b", cos.alias("cos"))
            .where(F.col("cos") >= threshold)
            .select("vec_a", "vec_b", F.round("cos", 6).alias("cos")))


def ivf_topk(embeddings: DataFrame, query_ids: list, k: int = 5,
             n_centroids: int = 8) -> DataFrame:
    """ANN: search only the query's IVF cell."""
    assign = ivf_assign(embeddings, n_centroids)
    e = with_double_vec(embeddings).join(assign, "vec_id")
    q = e.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"),
        F.col("centroid_id").alias("qcell"))
    pairs = e.join(F.broadcast(q),
                   (F.col("centroid_id") == F.col("qcell"))
                   & (F.col("vec_id") != F.col("query_id")))
    cos = (_dot(F.col("vec"), F.col("qvec"))
           / (_norm(F.col("vec")) * _norm(F.col("qvec"))))
    scored = pairs.select("query_id", F.col("vec_id").alias("neighbor_id"),
                          cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id",
                    F.round("cos", 6).alias("cos")))
