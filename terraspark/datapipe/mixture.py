"""Dataset mixture reweighting: temperature-flattened source weights +
deterministic per-doc subsampling (the data-mixing stage of large-corpus
training pipelines -- upweight small high-quality sources, downweight
the dominant crawl, decide per-document inclusion reproducibly).

Weights follow the standard temperature rule w_s = n_s^alpha / sum_t
n_t^alpha (alpha < 1 flattens the source distribution); each source then
gets sampling probability p_s = min(1, rate * N * w_s / n_s), and a
document is kept iff its deterministic TWO-STEP MINSTD draw
x1 = (48271 * doc_id + 11) mod (2^31-1); draw = (48271 * x1 + 11) mod
(2^31-1) falls below floor(p_s * (2^31-1)).  ONE step is not enough:
for doc_id < ~44k the single-step value 48271*id + 11 never reaches a
p~0.5 threshold (~2^30), so small-id corpora would be kept wholesale --
the second step spreads any id range across the full modulus.  Every
decision is a pure function of (doc_id, per-source counts), so reruns,
resumes and the SQL oracle agree row-for-row -- no RNG state.

Scale shape: two tiny aggregates (per-source counts -> a one-row total),
one broadcast join of the per-source weight table back onto the corpus,
and a map-side-combinable count; the corpus is scanned once and never
shuffled.  alpha is fixed at 0.5 here so the weight uses sqrt(), which
is IEEE-correctly-rounded in both engines; other alphas would go
through pow() whose last ulp is not portable.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LCG_A = 48_271               # MINSTD
LCG_B = 11
LCG_P = 2_147_483_647


def _minstd_draw(id_col: str):
    """Two MINSTD LCG steps over the doc id, sign- and overflow-safe.

    ``F.pmod`` keeps every step in [0, P): Spark's ``%`` is signed, so a
    negative id would otherwise yield a negative draw that always passes
    ``draw < thresh`` (row kept regardless of p_sample).  Reducing the id
    mod P FIRST bounds the multiplicand, so ``LCG_A * x`` never exceeds
    ~1.04e14 -- no int64 overflow for ANY long id (the naive
    ``LCG_A * doc_id`` overflows at ids >= ~1.9e14, plausible for 64-bit
    hashed ids).  For non-negative ids the value is unchanged --
    (A*(id mod P)+B) mod P == (A*id+B) mod P -- so the SQL oracle's
    direct form stays bit-identical on the documented domain.
    """
    x0 = F.pmod(F.col(id_col), F.lit(LCG_P))
    x1 = F.pmod(F.lit(LCG_A) * x0 + F.lit(LCG_B), F.lit(LCG_P))
    return F.pmod(F.lit(LCG_A) * x1 + F.lit(LCG_B), F.lit(LCG_P))


def temperature_mixture(docs: DataFrame, source_col: str = "source",
                        id_col: str = "doc_id",
                        rate: float = 0.5) -> DataFrame:
    """(source, n_docs, n_sampled, weight, p_sample) -- see module doc."""
    counts = docs.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").cast("double").alias("N"),
                     F.sum(F.sqrt(F.col("n_docs").cast("double")))
                     .alias("denom"))
    w = (counts.crossJoin(F.broadcast(tot))
         .withColumn("weight",
                     F.sqrt(F.col("n_docs").cast("double")) / F.col("denom"))
         .withColumn("p", F.least(
             F.lit(1.0),
             F.lit(rate) * F.col("N") * F.col("weight") / F.col("n_docs"))))
    draw = _minstd_draw(id_col)
    thresh = F.floor(F.col("p") * F.lit(LCG_P)).cast("long")
    sampled = (docs.select(source_col, F.col(id_col))
               .join(F.broadcast(w.select(source_col, "p")), source_col)
               .where(draw < thresh)
               .groupBy(source_col)
               .agg(F.count("*").cast("long").alias("n_sampled")))
    return (w.join(sampled, source_col, "left")
            .select(source_col, "n_docs",
                    F.coalesce("n_sampled", F.lit(0)).cast("long")
                    .alias("n_sampled"),
                    F.round("weight", 6).alias("weight"),
                    F.round("p", 6).alias("p_sample")))


def sample_docs(docs: DataFrame, source_col: str = "source",
                id_col: str = "doc_id", rate: float = 0.5) -> DataFrame:
    """Row-level companion of :func:`temperature_mixture`: the kept
    (id, source) rows under the identical weight/draw rule -- what a
    pipeline actually applies after reading the per-source summary."""
    counts = docs.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").cast("double").alias("N"),
                     F.sum(F.sqrt(F.col("n_docs").cast("double")))
                     .alias("denom"))
    w = (counts.crossJoin(F.broadcast(tot))
         .withColumn("weight",
                     F.sqrt(F.col("n_docs").cast("double")) / F.col("denom"))
         .withColumn("p", F.least(
             F.lit(1.0),
             F.lit(rate) * F.col("N") * F.col("weight") / F.col("n_docs"))))
    draw = _minstd_draw(id_col)
    thresh = F.floor(F.col("p") * F.lit(LCG_P)).cast("long")
    return (docs.select(F.col(id_col), F.col(source_col))
            .join(F.broadcast(w.select(source_col, "p")), source_col)
            .where(draw < thresh)
            .select(id_col, source_col))
