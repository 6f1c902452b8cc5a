"""Product quantization (PQ) of embedding vectors.

The memory-scale path for ANN at corpus size: a d-dim float vector
becomes m uint8 codes (one per subspace), shrinking the resident index
by ~d*4/m bytes per vector -- the standard IVF-PQ layout (Jegou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

Spark shape: the codebook is driver-tiny (m subspaces x k codes x d/m
floats -- same class as IVF centroids / k-means state), broadcast as
literal arrays; assignment is pure JVM expression work (slice + zip_with
squared-distance + argmin via array_sort), so encoding a 100 TB
embedding table is one narrow scan with zero Python and zero shuffle.
Codebook here = subvectors of the k lowest vec_ids (the same
deterministic stand-in the IVF operators start from, upgradeable to
clustering.kmeans_centroids per subspace without changing this
function's shape) -- chosen so the SQL oracle can reproduce the EXACT
codebook.

Determinism: distances are rounded (6 dp) BEFORE the argmin and ties
break toward the lowest code index, so engine and oracle agree even
when the codebook contains near-identical subvectors.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import with_double_vec


def pq_encode(embeddings: DataFrame, m: int = 8, k: int = 8,
              _dim: int | None = None, _seeds=None) -> DataFrame:
    """(vec_id, subspace, code, err): per-subspace nearest-codebook
    assignment with err = squared L2 distance to the chosen code
    (rounded 6 dp).  ``m`` subspaces of dim/m dims each; codebook per
    subspace = the matching subvectors of the ``k`` lowest vec_ids.

    ``_dim``/``_seeds`` let a caller that already ran the dim probe and
    the TakeOrdered seed collect (pq_topk) pass them through instead of
    re-running those two driver jobs."""
    e = with_double_vec(embeddings).select("vec_id", "vec")
    dim = _dim if _dim is not None else len(e.select("vec").head()["vec"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    seed_rows = _seeds if _seeds is not None \
        else e.orderBy("vec_id").limit(k).collect()   # TakeOrdered, k rows
    # codebook[s][j] = subvector s of the j-th lowest vec_id
    codebook = [[[float(x) for x in r["vec"][s * sub:(s + 1) * sub]]
                 for r in seed_rows] for s in range(m)]

    # ONE SQL string instead of ~m*k py4j Column constructions: plan
    # building dropped from ~4 s to milliseconds, identical semantics.
    # Codebook literals go through CAST('<repr>' AS DOUBLE) -- repr
    # round-trips the double exactly and the string cast parses it back
    # bit-identically (a bare SQL float literal would become DECIMAL).
    # array_min's natural struct ordering IS (err asc, code asc), the
    # rounded-argmin tie-break.
    parts = []
    for s in range(m):
        cands = ", ".join(
            "struct(round(aggregate(zip_with(slice(vec, {a}, {n}), "
            "array({cl}), (x, y) -> (x - y) * (x - y)), 0.0D, "
            "(acc, x) -> acc + x), 6) as err, {j} as code)".format(
                a=s * sub + 1, n=sub, j=j,
                cl=", ".join(f"CAST('{v!r}' AS DOUBLE)"
                             for v in codebook[s][j]))
            for j in range(k))
        parts.append(f"struct({s} as subspace, "
                     f"array_min(array({cands})) as b)")
    return (e.select("vec_id",
                     F.expr(f"inline(array({', '.join(parts)}))"))
            .select("vec_id", "subspace",
                    F.col("b.code").alias("code"),
                    F.col("b.err").alias("err")))


def pq_encode_sql(m: int = 8, k: int = 8, dim: int = 64,
                  table: str = "embeddings") -> str:
    """DuckDB/ANSI oracle computing the identical PQ assignment (same
    codebook rule, same rounded-distance argmin, same tie-break)."""
    sub = dim // m
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                   FROM {table}),
        cb AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                      AS code, v
               FROM e ORDER BY vec_id LIMIT {k}),
        ep AS (SELECT vec_id, UNNEST(v) AS x,
                      generate_subscripts(v, 1) AS pos
               FROM e),
        cp AS (SELECT code, UNNEST(v) AS c,
                      generate_subscripts(v, 1) AS pos
               FROM cb),
        d AS (
            SELECT ep.vec_id, CAST((ep.pos - 1) // {sub} AS INT)
                       AS subspace, cp.code,
                   ROUND(SUM((ep.x - cp.c) * (ep.x - cp.c)), 6) AS err
            FROM ep JOIN cp USING (pos)
            GROUP BY ep.vec_id, (ep.pos - 1) // {sub}, cp.code),
        best AS (
            SELECT vec_id, subspace, code, err,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                      ORDER BY err, code) rn
            FROM d)
        SELECT vec_id, subspace, code, err
        FROM best WHERE rn = 1
    """


def pq_topk(embeddings: DataFrame, query_ids, m: int = 8,
            k_codes: int = 8, k: int = 10,
            codes: DataFrame | None = None) -> DataFrame:
    """Approximate top-k neighbors by PQ asymmetric distance (ADC,
    Jegou et al. 2011): per query, a LUT of squared distances from the
    query's subvectors to every codebook entry (nq x m x k_codes rows --
    driver/broadcast tiny) is joined to the corpus CODES (never the raw
    vectors), and the approximate distance is the sum of m looked-up
    cells.  The memory-scale ANN path: the scan side carries m small
    ints per vector instead of the float vector.

    Output (query_id, rank, neighbor_id, adist): adist = ROUND(sum, 6)
    -- the addends are 6-dp multiples, so their sum sits ON the 6-dp
    grid and rounding is boundary-free in both engines;
    rank by (adist asc, neighbor_id asc), self excluded.  All distance
    arithmetic is Spark-side with the same rounding the SQL oracle uses.

    ``codes``: a precomputed :func:`pq_encode` result (vec_id, subspace,
    code) for the SAME (m, k_codes) -- pass it when the caller already
    encoded the corpus (a real IVF-PQ index encodes once and serves many
    queries) so the search never re-runs the full-corpus encode; without
    it the function stays self-contained and encodes internally.
    """
    from pyspark.sql import Window

    e = with_double_vec(embeddings).select("vec_id", "vec")
    spark = embeddings.sparkSession
    dim = len(e.select("vec").head()["vec"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    seed_rows = e.orderBy("vec_id").limit(k_codes).collect()
    cb_rows = [(s, j,
                [float(x) for x in seed_rows[j]["vec"][s * sub:(s + 1) * sub]])
               for s in range(m) for j in range(k_codes)]
    cb = spark.createDataFrame(cb_rows,
                               "subspace int, code int, cvec array<double>")

    qdf = e.where(F.col("vec_id").isin(list(query_ids))) \
        .select(F.col("vec_id").alias("query_id"), "vec")
    qs = F.slice("vec", F.col("subspace") * sub + 1, sub)
    d2 = F.aggregate(F.zip_with(qs, "cvec", lambda a, b: (a - b) * (a - b)),
                     F.lit(0.0), lambda acc, x: acc + x)
    lut = qdf.crossJoin(F.broadcast(cb)).select(
        "query_id", "subspace", "code", F.round(d2, 6).alias("d2"))

    if codes is None:
        codes = pq_encode(embeddings, m=m, k=k_codes,
                          _dim=dim, _seeds=seed_rows)
    codes = codes.select("vec_id", "subspace", "code")
    scored = (codes.join(F.broadcast(lut), ["subspace", "code"])
              .where(F.col("vec_id") != F.col("query_id"))
              .groupBy("query_id", "vec_id")
              .agg(F.round(F.sum("d2"), 6).alias("adist")))
    order = [F.asc("adist"), F.asc("vec_id")]
    w1 = Window.partitionBy("query_id",
                            F.pmod(F.xxhash64("vec_id"), F.lit(16))) \
        .orderBy(*order)
    pruned = (scored.withColumn("r1", F.row_number().over(w1))
              .where(F.col("r1") <= k).drop("r1"))
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (pruned.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k)
            .select("query_id", "rank",
                    F.col("vec_id").alias("neighbor_id"), "adist"))


def pq_topk_sql(query_ids, m: int = 8, k_codes: int = 8, k: int = 10,
                dim: int = 64, table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`pq_topk`: same codebook, same rounded
    LUT, same ADC sum and (adist, neighbor_id) ranking."""
    sub = dim // m
    qids = ", ".join(str(int(q)) for q in query_ids)
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                   FROM {table}),
        cb AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                      AS code, v
               FROM e ORDER BY vec_id LIMIT {k_codes}),
        ep AS (SELECT vec_id, UNNEST(v) AS x,
                      generate_subscripts(v, 1) AS pos FROM e),
        cp AS (SELECT code, UNNEST(v) AS c,
                      generate_subscripts(v, 1) AS pos FROM cb),
        d AS (
            SELECT ep.vec_id, CAST((ep.pos - 1) // {sub} AS INT)
                       AS subspace, cp.code,
                   ROUND(SUM((ep.x - cp.c) * (ep.x - cp.c)), 6) AS err
            FROM ep JOIN cp USING (pos)
            GROUP BY ep.vec_id, (ep.pos - 1) // {sub}, cp.code),
        best AS (
            SELECT vec_id, subspace, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                      ORDER BY err, code) rn
            FROM d),
        codes_raw AS (SELECT vec_id, subspace, code FROM best WHERE rn = 1),
        qp AS (SELECT vec_id AS query_id, x, pos FROM ep
               WHERE vec_id IN ({qids})),
        lut AS (
            SELECT qp.query_id, CAST((qp.pos - 1) // {sub} AS INT)
                       AS subspace, cp.code,
                   ROUND(SUM((qp.x - cp.c) * (qp.x - cp.c)), 6) AS d2
            FROM qp JOIN cp USING (pos)
            GROUP BY qp.query_id, (qp.pos - 1) // {sub}, cp.code),
        summed AS (
            SELECT l.query_id, cr.vec_id AS neighbor_id,
                   ROUND(SUM(l.d2), 6) AS adist
            FROM codes_raw cr
            JOIN lut l ON l.subspace = cr.subspace AND l.code = cr.code
            WHERE cr.vec_id <> l.query_id
            GROUP BY l.query_id, cr.vec_id),
        ranked AS (
            SELECT query_id, neighbor_id, adist,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adist, neighbor_id) AS rank
            FROM summed)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, adist
        FROM ranked WHERE rank <= {k}
    """
