"""Distributed k-means over embedding vectors (iterative algorithm demo).

Lloyd's algorithm with the standard Spark shape: centroids live on the
driver (k x dim -- tiny), assignments and centroid recomputation are
distributed DataFrame ops.  Fully deterministic: init = the k lowest
vec_ids, cosine assignment with ties broken by centroid index, fixed
iteration count.  This is the class of op the driver records as rows-only
(no closed-form SQL oracle); tests assert determinism and monotone
improvement instead.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import with_double_vec


def _assign(e: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Add a ``cluster`` column: argmax cosine vs the driver-side centroid
    matrix (k x dim doubles).

    The matrix ships as ONE nested array literal walked by a single
    ``transform`` -- not k separate fold expressions -- so the plan and
    its codegen stay O(1) in k (the literal grows, the expression tree
    does not; at k=8 this cut Lloyd-iteration compile+run time ~2x).
    Arithmetic is unchanged from the k-expression form (same left-to-
    right zip_with dot fold, same norms), so the dp_kmeans oracle's
    list_cosine_similarity parity is untouched."""
    norms = np.linalg.norm(centroids, axis=1)
    # single nested-array Literal nodes, NOT k x dim nested F.array(F.lit)
    # calls: the values and arithmetic are identical, but the expression
    # tree stays O(1) in k x dim -- at k=8, dim=64 the per-iteration
    # analyze/optimize/codegen cost of the 500+-node literal tree was the
    # largest driver-side gap in the bench timeline (no job running while
    # the plan compiles)
    cmat = F.lit([[float(x) for x in c] for c in centroids])
    cnorm = F.lit([float(x) for x in norms])
    vnorm = F.sqrt(F.aggregate("vec", F.lit(0.0),
                               lambda acc, x: acc + x * x))
    scores = F.transform(
        cmat,
        lambda cv, i: F.struct(
            (F.aggregate(F.zip_with("vec", cv, lambda a, b: a * b),
                         F.lit(0.0), lambda acc, x: acc + x)
             / (vnorm * F.element_at(cnorm, i + 1))).alias("cos"),
            i.cast("int").alias("cid")))
    best = F.array_sort(
        scores,
        lambda a, b: F.when(a.cos > b.cos, -1).when(a.cos < b.cos, 1)
        .when(a.cid < b.cid, -1).otherwise(1))[0]
    return e.withColumn("cluster", best.cid).withColumn("cos", best.cos)


def _lloyd(e: DataFrame, k: int, iters: int):
    """Shared Lloyd loop: returns (last assignment DF, final centroid
    matrix c_iters).  The assignment is the one computed against
    c_{iters-1} (kmeans contract); c_iters is the post-loop recompute
    (kmeans_centroids contract -- what an IVF index would be built on).

    Seed scale note: ``orderBy(...).limit(k)`` does NOT plan a global
    sort -- Spark compiles it to TakeOrderedAndProject (per-partition
    bounded top-k partials merged on the driver, k rows total), so the
    seed costs one narrow scan at any corpus size.  Locked by a plan
    assertion in tests/test_cluster_repetition.py."""
    init = e.orderBy("vec_id").limit(k).collect()
    centroids = np.array([r["vec"] for r in init], dtype=np.float64)
    dim = centroids.shape[1]
    assigned = None
    for _ in range(iters):
        assigned = _assign(e, centroids)
        # Centroid recompute folded into the assignment pass (one job per
        # iteration, VERDICT r4 item 3): groupBy(cluster) emits per-dim
        # SUM partials + a count -- a k-row map-side-combined hash agg on
        # the already-assigned frame.  The shuffle carries partitions x k
        # rows of (dim+1) doubles and, unlike the previous
        # posexplode(vec) -> groupBy(cluster, pos) shape, never generates
        # the rows x dim exploded frame at all.  Mean = sum/n, the same
        # partial-aggregation arithmetic F.avg performs.
        sums = (assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at("vec", i + 1)).alias(f"s{i}")
              for i in range(dim)]).collect())
        new = centroids.copy()
        for r in sums:
            new[r["cluster"]] = [r[f"s{i}"] / r["n"] for i in range(dim)]
        centroids = new
    return assigned, centroids


def kmeans(embeddings: DataFrame, k: int = 8, iters: int = 5) -> DataFrame:
    """Returns (vec_id, cluster, cos) after ``iters`` Lloyd iterations."""
    e = with_double_vec(embeddings).select("vec_id", "vec").persist()
    try:
        assigned, _ = _lloyd(e, k, iters)
        return assigned.select("vec_id", "cluster",
                               F.round("cos", 6).alias("cos"))
    finally:
        e.unpersist()


def kmeans_centroids(embeddings: DataFrame, k: int = 8,
                     iters: int = 5) -> DataFrame:
    """Trained IVF centroids: (centroid_id, cvec double[]) after ``iters``
    full Lloyd recomputes -- plug into similarity.ivf_assign/ivf_topk
    (``centroids=``) to replace the lowest-vec_id stand-in.  The matrix is
    k x dim (driver-tiny); returned as a DataFrame so the IVF side can
    broadcast it like any other centroid table."""
    spark = embeddings.sparkSession
    e = with_double_vec(embeddings).select("vec_id", "vec").persist()
    try:
        _, centroids = _lloyd(e, k, iters)
    finally:
        e.unpersist()
    rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    return spark.createDataFrame(rows, "centroid_id int, cvec array<double>")


def inertia(assigned_with_vec: DataFrame) -> float:
    """Mean assignment cosine (higher = tighter clusters)."""
    return assigned_with_vec.agg(F.avg("cos")).collect()[0][0]
