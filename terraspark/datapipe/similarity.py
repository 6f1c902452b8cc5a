"""Embedding similarity search: brute-force cosine top-k + IVF-bucketed ANN.

Embeddings are ``array<float>`` columns; all math is done in float64 via
JVM-side higher-order functions (zip_with/aggregate -- no Python in the hot
path), bit-compatible with the DuckDB oracle's list_cosine_similarity.

Brute force is the exactness baseline (cross join vs a broadcast query
set); the IVF variant assigns vectors to the nearest of C fixed centroids
(the C lowest vec_ids -- a deterministic 'training' stand-in) and searches
only the query's cell(s), the standard inverted-file ANN scale path: the
centroid assignment is a broadcast join + max_by aggregation, the search a
co-partitioned per-cell top-k.  ``probes`` > 1 searches the query's nearest
N cells (multi-probe), trading compute for recall.

Scale shape (100 TB design):

* top-k is TWO-LEVEL: level 1 prunes to k rows per (query, hash bucket of
  the neighbor id) -- each per-bucket sort is bounded by ~N/P rows and the
  P buckets of one query run as P independent tasks; level 2 ranks the
  surviving <= k*P rows per query.  The global top-k equals the top-k of
  the union of per-bucket top-ks, so results are identical to a single
  window -- without the single-task whole-corpus sort that
  ``Window.partitionBy(query_id)`` alone would plan.
* near-dup pair generation caps cell sizes (``max_cell``): a degenerate
  cell (e.g. all-zero embeddings) would otherwise go quadratic inside one
  task.  Oversize cells are EXCLUDED (logged via :func:`cell_size_audit`);
  the SQL oracle applies the identical HAVING cap so engine and oracle
  stay in lockstep at any scale.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOPK_BUCKETS = 32          # level-1 fan-out of the two-level top-k
DEFAULT_MAX_CELL = 10_000  # near-dup pair-generation cell cap


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_double_vec(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("vec", F.transform(F.col(col),
                                            lambda x: x.cast("double")))


def _topk_per_query(scored: DataFrame, k: int,
                    n_buckets: int = TOPK_BUCKETS) -> DataFrame:
    """Two-level distributed top-k of ``scored`` (query_id, neighbor_id,
    cos); deterministic order (cos desc, neighbor_id asc).  See module
    docstring for why this beats a single per-query window at scale."""
    order = [F.desc("cos"), F.asc("neighbor_id")]
    w1 = Window.partitionBy("query_id", "bucket").orderBy(*order)
    pruned = (scored
              .withColumn("bucket",
                          F.pmod(F.xxhash64("neighbor_id"),
                                 F.lit(n_buckets)))
              .withColumn("r1", F.row_number().over(w1))
              .where(F.col("r1") <= k)
              .drop("bucket", "r1"))
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (pruned.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id",
                    F.round("cos", 6).alias("cos")))


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
    return _topk_per_query(scored, k)


def ivf_assign(embeddings: DataFrame, n_centroids: int = 8,
               probes: int = 1) -> DataFrame:
    """Assign every vector to its ``probes`` nearest centroids (max cosine;
    ties by centroid id).  Centroids = the n lowest vec_ids (deterministic).
    probes=1 returns (vec_id, centroid_id) via a shuffle-light groupBy
    max_by (map-side combine, no window sort)."""
    e = with_double_vec(embeddings)
    w_ids = e.select("vec_id").orderBy("vec_id").limit(n_centroids)
    cent = e.join(F.broadcast(w_ids), "vec_id").select(
        F.col("vec_id").alias("centroid_id"), F.col("vec").alias("cvec"))
    cos = (_dot(F.col("vec"), F.col("cvec"))
           / (_norm(F.col("vec")) * _norm(F.col("cvec"))))
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "centroid_id", cos.alias("ccos"))
    if probes == 1:
        # argmax via max_by on (cos, -centroid_id): max cosine, ties to the
        # LOWEST centroid id -- aggregation with partial combine instead of
        # a row_number window (no per-key sort, half the shuffle)
        return scored.groupBy("vec_id").agg(
            F.expr("max_by(centroid_id, struct(ccos, -centroid_id))")
            .alias("centroid_id"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"),
                                             F.asc("centroid_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= probes).select("vec_id", "centroid_id"))


def cell_size_audit(assign: DataFrame, max_cell: int) -> DataFrame:
    """Cells exceeding the pair-generation cap (to log/alert on)."""
    return (assign.groupBy("centroid_id").agg(F.count("*").alias("n"))
            .where(F.col("n") > max_cell))


def neardup_pairs(embeddings: DataFrame, threshold: float = 0.8,
                  n_centroids: int = 8,
                  max_cell: int = DEFAULT_MAX_CELL) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by IVF cell: the
    quadratic comparison only runs inside each centroid's bucket (the
    embedding analogue of LSH banding).  Cells above ``max_cell`` are
    excluded from pairing (skew guard -- see module docstring; audit the
    drops with :func:`cell_size_audit`).  Returns (vec_a < vec_b, cos)."""
    assign = ivf_assign(embeddings, n_centroids)
    sizes = assign.groupBy("centroid_id").agg(F.count("*").alias("_n"))
    ok = sizes.where(F.col("_n") <= max_cell).select("centroid_id")
    e = (with_double_vec(embeddings).join(assign, "vec_id")
         .join(F.broadcast(ok), "centroid_id"))
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
             n_centroids: int = 8, probes: int = 1) -> DataFrame:
    """ANN: search the query's ``probes`` nearest IVF cells (multi-probe
    recovers recall lost to cell-boundary effects; measured vs brute force
    in tests/test_datapipe_extra.py)."""
    assign = ivf_assign(embeddings, n_centroids)
    e = with_double_vec(embeddings).join(assign, "vec_id")
    # query probe cells come from the FULL centroid set (same assignment
    # universe as the data vectors), ranked by cosine
    qv = with_double_vec(embeddings.where(F.col("vec_id").isin(query_ids)))
    w_ids = with_double_vec(embeddings).select("vec_id") \
        .orderBy("vec_id").limit(n_centroids)
    cent = with_double_vec(embeddings).join(F.broadcast(w_ids), "vec_id") \
        .select(F.col("vec_id").alias("centroid_id"),
                F.col("vec").alias("cvec"))
    ccos = (_dot(F.col("vec"), F.col("cvec"))
            / (_norm(F.col("vec")) * _norm(F.col("cvec"))))
    wq = Window.partitionBy("vec_id").orderBy(F.desc("ccos"),
                                              F.asc("centroid_id"))
    probe = (qv.crossJoin(F.broadcast(cent))
             .select("vec_id", "vec", "centroid_id", ccos.alias("ccos"))
             .withColumn("rn", F.row_number().over(wq))
             .where(F.col("rn") <= probes)
             .select(F.col("vec_id").alias("query_id"),
                     F.col("vec").alias("qvec"),
                     F.col("centroid_id").alias("qcell")))
    pairs = e.join(F.broadcast(probe),
                   (F.col("centroid_id") == F.col("qcell"))
                   & (F.col("vec_id") != F.col("query_id")))
    cos = (_dot(F.col("vec"), F.col("qvec"))
           / (_norm(F.col("vec")) * _norm(F.col("qvec"))))
    # no dedup needed across probes: every data vector lives in exactly
    # one cell, so a neighbor reaches a query through at most one probe
    scored = pairs.select("query_id", F.col("vec_id").alias("neighbor_id"),
                          cos.alias("cos"))
    return _topk_per_query(scored, k)
