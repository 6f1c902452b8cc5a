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
SUB_BLOCK = 1_024          # cells above this size pair via hash sub-blocks
SRP_BITS = 16              # signed-random-projection signature width
SRP_SEED = 20240817        # hyperplane RNG seed (shared with the oracle)
SRP_BANDS = 2              # near-dup banding of the SRP signature
DEFAULT_MAX_SRP_BUCKET = 5_000  # SRP band-bucket pair-generation cap


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_double_vec(df: DataFrame, col: str = "embedding") -> DataFrame:
    # spread a narrow (single-split) embedding scan so the vector math
    # parallelizes; no-op on production-scale scans (util.spread_input)
    from .util import spread_input
    return spread_input(df).withColumn(
        "vec", F.transform(F.col(col), lambda x: x.cast("double")))


def srp_hyperplanes(dim: int, bits: int = SRP_BITS,
                    seed: int = SRP_SEED) -> list[list[int]]:
    """Deterministic Rademacher (+-1) hyperplanes, one row per signature
    bit.  The SAME literal rows are inlined into the engine's column
    expressions and the DuckDB oracle's SQL (oracle_sql dp_srp_signature),
    so both sides project against byte-identical planes."""
    import numpy as np
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, size=(bits, dim)) * 2 - 1).tolist()


def srp_signature(embeddings: DataFrame, dim: int,
                  bits: int = SRP_BITS) -> DataFrame:
    """16-bit signed-random-projection (cosine-LSH) signature: bit j of
    ``srp`` is ``dot(v, h_j) > 0`` for the j-th Rademacher hyperplane --
    Charikar's SimHash for real vectors (the embedding analogue of
    dedup.simhash16; hamming distance estimates angular distance).

    Scale shape: one narrow projection per row, pure JVM higher-order
    functions -- NO shuffle, NO Python; at 10^12 rows this is a single
    map stage appended to the scan."""
    planes = srp_hyperplanes(dim, bits)
    e = with_double_vec(embeddings)
    sig = None
    for j, h in enumerate(planes):
        # one array Literal per plane (same values/arithmetic as the
        # F.array-of-F.lit form, but a bits x dim literal forest made the
        # plan-compile time a visible driver-side stall at bits=16,dim=64)
        dot = _dot(F.col("vec"), F.lit([float(x) for x in h]))
        bit = F.when(dot > 0, F.lit(1 << (bits - 1 - j))).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return e.select("vec_id", sig.cast("long").alias("srp"))


def srp_band_rows(sig: DataFrame, bands: int = SRP_BANDS,
                  bits: int = SRP_BITS) -> DataFrame:
    """Split each SRP signature into ``bands`` contiguous bit-bands:
    (vec_id, band, bkey) rows, ``bands`` per vector.  Two signatures whose
    angular distance is small agree on ALL bits of at least one band with
    high probability (classic LSH banding, here over Charikar bits)."""
    width = bits // bands
    mask = (1 << width) - 1
    entries = [
        F.struct(
            F.lit(b).cast("int").alias("band"),
            F.shiftright(F.col("srp"), bits - width * (b + 1))
            .bitwiseAND(F.lit(mask)).cast("int").alias("bkey"))
        for b in range(bands)]
    return (sig.select("vec_id", F.explode(F.array(*entries)).alias("e"))
            .select("vec_id", F.col("e.band").alias("band"),
                    F.col("e.bkey").alias("bkey")))


def srp_bucket_audit(band_rows: DataFrame, max_bucket: int) -> DataFrame:
    """Band-buckets exceeding the pair-generation cap (to log/alert on)."""
    return (band_rows.groupBy("band", "bkey")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") > max_bucket))


def srp_neardup_pairs(embeddings: DataFrame, dim: int,
                      threshold: float = 0.8, bands: int = SRP_BANDS,
                      bits: int = SRP_BITS,
                      max_bucket: int = DEFAULT_MAX_SRP_BUCKET) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP (cosine-LSH) banding
    -- the third blocking strategy next to MinHash-LSH (text) and
    IVF-cell blocking (:func:`neardup_pairs`): candidates are pairs that
    agree on at least one signature band, verified with the exact double
    cosine and filtered at ``threshold``.  Returns (vec_a < vec_b, cos).

    Scale shape: the signature is a shuffle-free map stage; candidate
    generation is a self-equi-join on (band, bkey) -- only bucket-local
    pairs are ever materialized.  Buckets above ``max_bucket`` are
    EXCLUDED (skew guard, mirrored in the SQL oracle; audit the drops
    with :func:`srp_bucket_audit`).  At real corpus scale the default
    16-bit/2-band signature saturates (only 2^8 buckets per band):
    raise ``bits``/``bands`` together (e.g. 64-bit, 4 x 16-bit bands,
    2^16 buckets) -- the recall/precision trade is the standard LSH
    banding calculus, all parameterized here."""
    sig = srp_signature(embeddings, dim, bits)
    # the signature projection is a wide expression tree (bits x dim
    # literal folds -- expensive to codegen and to run) consumed by the
    # cap filter and both sides of the band self-join; materialize the
    # narrow (vec_id, srp) table once instead of re-running the
    # projection per consumer
    if not sig.isStreaming:
        sig = sig.localCheckpoint(eager=True)
    rows = srp_band_rows(sig, bands, bits)
    # bucket-key space is <= bands * 2^(bits/bands): tiny by construction,
    # so the cap filter always broadcasts
    ok = (rows.groupBy("band", "bkey").agg(F.count("*").alias("_n"))
          .where(F.col("_n") <= max_bucket).select("band", "bkey"))
    capped = rows.join(F.broadcast(ok), ["band", "bkey"])
    # pin the self-join + verify parallelism (see neardup_pairs: AQE
    # coalesces the few-MB band shuffle to 1-2 partitions and the exact
    # cosine verify then runs on one core); the keyed repartition IS the
    # join's exchange, so no shuffle is added
    n_parts = int(capped.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"))
    capped = capped.repartition(n_parts, "band", "bkey")
    cand = (capped.select("band", "bkey", F.col("vec_id").alias("vec_a"))
            .join(capped.select("band", "bkey",
                                F.col("vec_id").alias("vec_b")),
                  ["band", "bkey"])
            .where(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b").distinct()
            .repartition(n_parts, "vec_a"))
    e = with_double_vec(embeddings)
    va = e.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"))
    vb = e.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"))
    cos = (_dot(F.col("va"), F.col("vb"))
           / (_norm(F.col("va")) * _norm(F.col("vb"))))
    return (cand.join(va, "vec_a").join(vb, "vec_b")
            .select("vec_a", "vec_b", cos.alias("cos"))
            .where(F.col("cos") >= threshold)
            .select("vec_a", "vec_b", F.round("cos", 6).alias("cos")))


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


def default_centroids(embeddings: DataFrame,
                      n_centroids: int = 8) -> DataFrame:
    """The deterministic 'training' stand-in: centroids = the n lowest
    vec_ids.  Swap for :func:`terraspark.datapipe.clustering
    .kmeans_centroids` output to search trained cells (higher recall at
    equal probe cost -- measured in tests/test_datapipe_extra.py)."""
    e = with_double_vec(embeddings)
    w_ids = e.select("vec_id").orderBy("vec_id").limit(n_centroids)
    return e.join(F.broadcast(w_ids), "vec_id").select(
        F.col("vec_id").alias("centroid_id"), F.col("vec").alias("cvec"))


def ivf_assign(embeddings: DataFrame, n_centroids: int = 8,
               probes: int = 1, centroids: DataFrame | None = None) -> DataFrame:
    """Assign every vector to its ``probes`` nearest centroids (max cosine;
    ties by centroid id).  ``centroids`` (centroid_id, cvec double[]) --
    e.g. clustering.kmeans_centroids output -- overrides the lowest-vec_id
    stand-in.  probes=1 returns (vec_id, centroid_id) via a shuffle-light
    groupBy max_by (map-side combine, no window sort)."""
    e = with_double_vec(embeddings)
    cent = centroids if centroids is not None \
        else default_centroids(embeddings, n_centroids)
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
                  max_cell: int = DEFAULT_MAX_CELL,
                  sub_block: int = SUB_BLOCK,
                  n_blocks: int = 8,
                  centroids: DataFrame | None = None,
                  assign: DataFrame | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by IVF cell: the
    quadratic comparison only runs inside each centroid's bucket (the
    embedding analogue of LSH banding).  Cells above ``max_cell`` are
    excluded from pairing (skew guard -- see module docstring; audit the
    drops with :func:`cell_size_audit`).  Returns (vec_a < vec_b, cos).

    Skew guard #2 -- SUB-BLOCKING: a cell at the cap would still put
    max_cell^2 comparisons in ONE task.  Cells above ``sub_block`` rows
    split the self-join by a secondary hash of vec_id into ``n_blocks``
    buckets: the left side is replicated across all buckets, the right
    side keyed by its own bucket, so the join key becomes (cell, bucket)
    -- per-task pair count drops to n^2/n_blocks and the cell's work
    spreads over n_blocks tasks.  Each unordered pair (x < y) still
    appears EXACTLY once (x's replica in bucket(y) meets y; y's replica
    in bucket(x) meets x but fails x < y), so results are identical to
    the direct path (asserted in tests/test_dedup_caps.py).

    ``centroids`` (centroid_id, cvec double[]) swaps the lowest-vec_id
    stand-in cells for trained ones (clustering.kmeans_centroids) --
    the blocking gets tighter, the pair semantics are unchanged.  A
    caller that already assigned (semdedup) passes ``assign`` to avoid
    recomputing it."""
    if assign is None:
        # materialize the narrow (vec_id, centroid_id) table once: it is
        # consumed by the size probe below, the cap filter and the pair
        # join, and each would otherwise re-run the centroid crossJoin
        assign = ivf_assign(embeddings, n_centroids, centroids=centroids)
        if not assign.isStreaming:
            assign = assign.localCheckpoint(eager=True)
    # The per-cell population is one row per centroid (n_centroids is a
    # parameter -- driver-tiny even at a real IVF's 65k cells), so read
    # it once and build ONLY the branches that have members: in the
    # common homogeneous case (no cell above sub_block, or every big
    # cell) half the plan -- its shuffles, its union leg, its empty
    # 32-task stages -- disappears instead of executing on zero rows.
    # The kept-cell filter below still travels as a broadcast join; the
    # collected rows only steer plan construction, pair semantics are
    # byte-identical to the always-both-branches form.
    sizes_rows = assign.groupBy("centroid_id") \
        .agg(F.count("*").alias("_n")).collect()
    have_big = any(sub_block < r["_n"] <= max_cell for r in sizes_rows)
    # the small leg also serves as the typed empty frame when every cell
    # is excluded by the cap (it then selects zero rows naturally)
    have_small = any(r["_n"] <= sub_block for r in sizes_rows) \
        or not have_big
    sizes = assign.groupBy("centroid_id").agg(F.count("*").alias("_n"))
    ok = sizes.where(F.col("_n") <= max_cell) \
        .select("centroid_id", (F.col("_n") > sub_block).alias("_big"))
    e = (with_double_vec(embeddings).join(assign, "vec_id")
         .join(F.broadcast(ok), "centroid_id"))

    def pair_cos(pairs):
        cos = (_dot(F.col("va"), F.col("vb"))
               / (_norm(F.col("va")) * _norm(F.col("vb"))))
        return (pairs.select("vec_a", "vec_b", cos.alias("cos"))
                .where(F.col("cos") >= threshold)
                .select("vec_a", "vec_b", F.round("cos", 6).alias("cos")))

    # Pin the pair-join parallelism: the quadratic compare + cosine
    # verify evaluate inside the join stage, whose input shuffles are a
    # few MB of narrow rows -- AQE coalesces them to 1-2 partitions by
    # BYTE size and the whole verify then runs on one core (observed: a
    # 2.3 s single-task stage doing every pair's 64-dim cosine).  An
    # explicit keyed repartition replaces the join's own exchange (same
    # key, no extra shuffle) with a partition count AQE leaves alone, so
    # per-CELL work spreads across tasks.  Partition count = the session
    # shuffle setting (scale-parameterized, not a local constant).
    n_parts = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    legs = []
    if have_small:
        small = e.where(~F.col("_big"))
        a = small.select(F.col("vec_id").alias("vec_a"),
                         F.col("vec").alias("va"), "centroid_id") \
            .repartition(n_parts, "centroid_id")
        b = small.select(F.col("vec_id").alias("vec_b"),
                         F.col("vec").alias("vb"), "centroid_id") \
            .repartition(n_parts, "centroid_id")
        legs.append(pair_cos(a.join(b, "centroid_id")
                             .where(F.col("vec_a") < F.col("vec_b"))))
    if have_big:
        big = e.where(F.col("_big"))
        bkt = F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
        ab = (big.select(F.col("vec_id").alias("vec_a"),
                         F.col("vec").alias("va"), "centroid_id")
              .withColumn("bucket",
                          F.explode(F.sequence(F.lit(0),
                                               F.lit(n_blocks - 1))))
              .repartition(n_parts, "centroid_id", "bucket"))
        bb = big.select(F.col("vec_id").alias("vec_b"),
                        F.col("vec").alias("vb"), "centroid_id",
                        bkt.alias("bucket")) \
            .repartition(n_parts, "centroid_id", "bucket")
        legs.append(pair_cos(ab.join(bb, ["centroid_id", "bucket"])
                             .where(F.col("vec_a") < F.col("vec_b"))))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def ivf_topk(embeddings: DataFrame, query_ids: list, k: int = 5,
             n_centroids: int = 8, probes: int = 1,
             centroids: DataFrame | None = None) -> DataFrame:
    """ANN: search the query's ``probes`` nearest IVF cells (multi-probe
    recovers recall lost to cell-boundary effects; measured vs brute force
    in tests/test_datapipe_extra.py).  ``centroids`` swaps the lowest-
    vec_id stand-in for trained ones (clustering.kmeans_centroids)."""
    cent = centroids if centroids is not None \
        else default_centroids(embeddings, n_centroids)
    assign = ivf_assign(embeddings, n_centroids, centroids=cent)
    e = with_double_vec(embeddings).join(assign, "vec_id")
    # query probe cells come from the FULL centroid set (same assignment
    # universe as the data vectors), ranked by cosine
    qv = with_double_vec(embeddings.where(F.col("vec_id").isin(query_ids)))
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


def hard_negatives(embeddings: DataFrame, query_ids: list) -> DataFrame:
    """Contrastive pair mining: for each query vector, the most-similar
    SAME-label vector (the positive) and the most-similar DIFFERENT-
    label vector (the hard negative), plus their margin -- the pair
    selection stage of contrastive/metric-learning data pipelines,
    where hard negatives (high-similarity wrong-label items) carry most
    of the training signal.

    Argmax runs on the 6-dp ROUNDED cosine with vec_id ascending as the
    tie-break (the pq_encode convention), so engine and SQL oracle pick
    identical winners even at float boundaries.  Shape: queries
    broadcast, corpus scanned once, ONE groupBy with two conditional
    struct-max aggregates (map-side combinable) -- no window over the
    full corpus, no second scan."""
    e = with_double_vec(embeddings)
    q = e.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel"),
        F.col("vec").alias("qvec"))
    pairs = e.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id"))
    cos = F.round(_dot(F.col("vec"), F.col("qvec"))
                  / (_norm(F.col("vec")) * _norm(F.col("qvec"))), 6)
    scored = pairs.select(
        "query_id", "qlabel",
        (F.col("label") == F.col("qlabel")).alias("same"),
        F.struct(cos.alias("cos"), (-F.col("vec_id")).alias("nid"),
                 F.col("vec_id").alias("id")).alias("c"))
    best = scored.groupBy("query_id", "qlabel").agg(
        F.max(F.when(F.col("same"), F.col("c"))).alias("p"),
        F.max(F.when(~F.col("same"), F.col("c"))).alias("n"))
    return best.select(
        "query_id", F.col("qlabel").alias("label"),
        F.col("p.id").alias("pos_id"), F.col("p.cos").alias("pos_cos"),
        F.col("n.id").alias("neg_id"), F.col("n.cos").alias("neg_cos"),
        F.round(F.col("p.cos") - F.col("n.cos"), 6).alias("margin"))


def semdedup(embeddings: DataFrame, threshold: float = 0.8,
             n_centroids: int = 8, iters: int = 2,
             max_cell: int = DEFAULT_MAX_CELL,
             sub_block: int = SUB_BLOCK, n_blocks: int = 8) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster the corpus with trained k-means cells, compare embeddings ONLY
    within their cell, and drop every vector that has a LOWER-id near
    duplicate (cos >= threshold) in its cell.  Returns one row per vector:
    (vec_id, cluster, keep) -- order-free, deterministic semantics (the
    lowest id of each near-duplicate relation always survives; a vector is
    dropped even if its witness is itself dropped, i.e. the rule is "keep
    iff no lower-id duplicate exists", not a greedy scan).

    Scale shape: k-means centroids are driver-tiny (k x dim), assignment
    is one broadcast join + max_by; the quadratic compare inherits ALL of
    :func:`neardup_pairs`'s skew guards (cell cap + hash sub-blocking), and
    the keep verdict is one distinct + left anti-ish join on narrow int64
    keys.  The corpus text/bytes never enter any shuffle.
    """
    from .clustering import kmeans_centroids
    cent = kmeans_centroids(embeddings, k=n_centroids, iters=iters)
    cent = cent.persist()
    try:
        assign = ivf_assign(embeddings, n_centroids, centroids=cent) \
            .persist()
        pairs = neardup_pairs(embeddings, threshold, n_centroids,
                              max_cell, sub_block, n_blocks,
                              centroids=cent, assign=assign)
        dropped = (pairs.select(F.col("vec_b").alias("vec_id")).distinct()
                   .withColumn("_drop", F.lit(True)))
        out = (assign.join(dropped, "vec_id", "left")
               .select("vec_id", F.col("centroid_id").alias("cluster"),
                       F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep")))
        # materialize before unpersisting the tables the plan uses
        out = out.localCheckpoint(eager=True)
    finally:
        cent.unpersist()
        try:
            assign.unpersist()
        except NameError:
            pass
    return out


def ann_recall(embeddings: DataFrame, query_ids, k: int = 5,
               probes_list=(1, 2)) -> DataFrame:
    """Recall@k audit of the IVF ANN path against brute-force cosine
    ground truth: (query_id, probes, n_hit, recall) for each probe
    count.  The "measure, don't guess" companion to :func:`ivf_topk` --
    a production index rollout gates on exactly this table (recall vs
    latency as probes grow).

    Scale: ground truth for the AUDIT SAMPLE only (|query_ids| rows per
    list entry, never all-pairs); each side is an existing top-k plan,
    the comparison is a k-row-per-query join.  The brute result is
    checkpointed once and reused across probe counts.
    """
    from functools import reduce
    brute = (cosine_topk(embeddings, query_ids, k=k)
             .select("query_id", "neighbor_id").localCheckpoint())
    outs = []
    for p in probes_list:
        approx = ivf_topk(embeddings, query_ids, k=k, probes=p) \
            .select("query_id", "neighbor_id")
        hits = (approx.join(brute, ["query_id", "neighbor_id"])
                .groupBy("query_id").agg(F.count("*").alias("n_hit")))
        outs.append(
            brute.select("query_id").distinct()
            .join(hits, "query_id", "left")
            .select("query_id", F.lit(p).cast("int").alias("probes"),
                    F.coalesce("n_hit", F.lit(0)).cast("long")
                    .alias("n_hit"),
                    F.round(F.coalesce("n_hit", F.lit(0))
                            / F.lit(float(k)), 6).alias("recall")))
    return reduce(lambda a, b: a.unionByName(b), outs)
