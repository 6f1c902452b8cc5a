"""Distributed graph analytics beyond connected components.

PageRank as pure dataflow: per iteration one join (rank -> out-edges)
and one groupBy-sum (contributions by destination), localCheckpointed so
the plan stays O(1) per round (the iterative-lineage trap,
cf. vectorize.connected_components).  The driver holds NO graph state --
only the node count scalar (the k-means-centroids exception).

Determinism: contribution sums are f64 and order-dependent at the
1e-16 level; results are reported ROUNDED (8 decimals) which absorbs
both Spark's aggregation order and the SQL oracle's (the dp_pagerank
oracle unrolls the same iterations as CTEs, like the Lloyd-in-SQL
k-means oracle).

At 100 TB: ranks and degrees are two narrow long/double columns keyed by
node; each iteration shuffles contributions once with map-side combine;
skewed high-degree nodes cost map-side only (their fan-out is the edge
list itself, already materialized).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, pr) after ``iters`` synchronous PageRank iterations over the
    DIRECTED edge list (symmetrize first for undirected graphs).

    Nodes = endpoints of edges.  Assumes every node has at least one
    out-edge (true for symmetrized graphs); dangling-mass redistribution
    is deliberately out of scope and documented.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .distinct().localCheckpoint()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr")) \
        .localCheckpoint()
    for _ in range(iters):
        contrib = (e.join(ranks.withColumnRenamed("node", "src"), "src")
                   .join(deg, "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("pr") / F.col("deg")).alias("c")))
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(summed, "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.lit(damping) * F.coalesce(F.col("s"),
                                                        F.lit(0.0)))
                         .alias("pr"))
                 .localCheckpoint())
    return ranks
