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


def pq_encode(embeddings: DataFrame, m: int = 8, k: int = 8) -> DataFrame:
    """(vec_id, subspace, code, err): per-subspace nearest-codebook
    assignment with err = squared L2 distance to the chosen code
    (rounded 6 dp).  ``m`` subspaces of dim/m dims each; codebook per
    subspace = the matching subvectors of the ``k`` lowest vec_ids."""
    e = with_double_vec(embeddings).select("vec_id", "vec")
    dim = len(e.select("vec").head()["vec"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    seed_rows = e.orderBy("vec_id").limit(k).collect()   # TakeOrdered, k rows
    # codebook[s][j] = subvector s of the j-th lowest vec_id
    codebook = [[[float(x) for x in r["vec"][s * sub:(s + 1) * sub]]
                 for r in seed_rows] for s in range(m)]

    per_sub = []
    for s in range(m):
        xs = F.slice("vec", s * sub + 1, sub)
        cands = []
        for j in range(k):
            c = F.array(*[F.lit(v) for v in codebook[s][j]])
            d2 = F.aggregate(
                F.zip_with(xs, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x)
            cands.append(F.struct(F.round(d2, 6).alias("err"),
                                  F.lit(j).alias("code")))
        best = F.array_sort(
            F.array(*cands),
            lambda a, b: F.when(a.err < b.err, -1).when(a.err > b.err, 1)
            .when(a.code < b.code, -1).otherwise(1))[0]
        per_sub.append(F.struct(F.lit(s).alias("subspace"),
                                best.code.alias("code"),
                                best.err.alias("err")))
    return (e.select("vec_id", F.explode(F.array(*per_sub)).alias("q"))
            .select("vec_id", "q.subspace", "q.code", "q.err"))


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
