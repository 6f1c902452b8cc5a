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
             src: str = "src", dst: str = "dst",
             dangling: str = "raise") -> DataFrame:
    """(node, pr) after ``iters`` synchronous PageRank iterations over the
    DIRECTED edge list (symmetrize first for undirected graphs).

    Nodes = endpoints of edges.  Dangling nodes (no out-edge -- possible
    only for a non-symmetrized caller) are handled per ``dangling``:

    * ``"raise"`` (default): fail fast instead of silently leaking rank
      mass -- the caller either symmetrizes or opts into redistribution;
    * ``"redistribute"``: the standard fix -- each iteration the mass
      parked on dangling nodes is summed (one tiny agg: the dangling
      rank table is |dangling| narrow rows, the result a scalar) and
      spread uniformly over all nodes, so sum(pr) == 1 holds exactly.

    The dangling check itself is one count over the nodes-minus-degree
    anti-join, paid once.
    """
    if dangling not in ("raise", "redistribute"):
        raise ValueError(f"dangling must be raise|redistribute: {dangling}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .distinct().localCheckpoint()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    dangling_nodes = nodes.join(
        deg.select(F.col("src").alias("node")), "node", "left_anti") \
        .localCheckpoint()
    n_dangling = dangling_nodes.count()
    if n_dangling and dangling == "raise":
        sample = [r["node"] for r in dangling_nodes.limit(5).collect()]
        raise ValueError(
            f"pagerank: {n_dangling} node(s) have no out-edge (e.g. "
            f"{sample}); rank mass would leak.  Symmetrize the edge list "
            f"or call with dangling='redistribute'.")
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr")) \
        .localCheckpoint()
    for _ in range(iters):
        if n_dangling:
            d_mass = (ranks.join(dangling_nodes, "node")
                      .agg(F.sum("pr")).collect()[0][0] or 0.0)
        else:
            d_mass = 0.0
        contrib = (e.join(ranks.withColumnRenamed("node", "src"), "src")
                   .join(deg, "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("pr") / F.col("deg")).alias("c")))
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(summed, "node", "left")
                 .select("node",
                         (F.lit(base + damping * d_mass / n)
                          + F.lit(damping) * F.coalesce(F.col("s"),
                                                        F.lit(0.0)))
                         .alias("pr"))
                 .localCheckpoint())
    return ranks
