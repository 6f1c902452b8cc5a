"""Mergeable cardinality sketches, cross-dialect deterministic.

A standard HyperLogLog uses engine-private 64-bit hashing, so estimates
never agree across engines and a correctness oracle can only rubber-stamp
"some number came out".  This HLL is defined over md5 HEX TEXT with only
ANSI-portable string/arithmetic ops (substr, instr, trim, power, ln), so
Spark and DuckDB compute the IDENTICAL registers and the IDENTICAL f64
estimate -- the driver gate checks it hash-exact, not approximately.

Determinism note: the register reduction is MAX (order-free) and the
2^-reg summation is over dyadic rationals with exponents in [-33, 0];
256 of those always sum EXACTLY in f64 (41 bits of significand needed,
53 available), so the estimate is bit-stable at any parallelism and any
aggregation order.  The only libm call is ln() in the linear-counting
branch (1 ulp cross-library risk, absorbed by the 4-decimal rounding).

Layout: p = 8 -> m = 256 registers; bucket = first two hex chars, rho =
1 + leading zero bits of the next 8 hex chars (4 bits per hex digit,
CASE on the first nonzero digit).  Standard bias correction
alpha_256 = 0.7213/(1 + 1.079/256) with linear counting below 2.5m.

At 100 TB: one shuffle of (group, bucket) max-partials (map-side
combine), then a 256-row-per-group reduction -- the classic mergeable-
sketch shape; registers union across datasets by element-wise MAX.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import md5_bucket8

HLL_P = 8
HLL_M = 1 << HLL_P                       # 256 registers
# same literal expression (and op order) the SQL oracle writes inline
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)


def hll_distinct(df: DataFrame, group_cols: list[str],
                 value_col: str) -> DataFrame:
    """(group..., exact_distinct, hll_est): portable-HLL estimate next to
    the exact count (the exact count is itself a distributed aggregate;
    at real scale drop it and keep the sketch)."""
    hexd = "0123456789abcdef"
    d = df.withColumn("_h", F.md5(F.col(value_col).cast("string")))
    d = d.withColumn("_bucket", md5_bucket8("_h")) \
         .withColumn("_t", F.expr("trim(LEADING '0' FROM substr(_h, 3, 8))")) \
         .withColumn("_v", F.expr(f"instr('{hexd[1:]}', substr(_t, 1, 1))"))
    rho = F.when(F.length("_t") == 0, F.lit(33)).otherwise(
        4 * (8 - F.length("_t"))
        + F.when(F.col("_v") >= 8, 0)
           .when(F.col("_v") >= 4, 1)
           .when(F.col("_v") >= 2, 2).otherwise(3)
        + 1)
    regs = d.groupBy(*group_cols, "_bucket").agg(
        F.max(rho).alias("reg"),
        # exact distinct rides the same shuffle as a per-bucket partial
        F.count_distinct(F.col(value_col)).alias("nd"))
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("present"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s_present"),
        F.sum("nd").alias("exact_distinct"))
    s_total = F.col("s_present") + (HLL_M - F.col("present"))
    v_empty = F.lit(HLL_M) - F.col("present")
    e_raw = F.lit(HLL_ALPHA) * HLL_M * HLL_M / s_total
    est = F.when((e_raw <= 2.5 * HLL_M) & (v_empty > 0),
                 F.lit(float(HLL_M)) * F.log(HLL_M / v_empty.cast("double"))
                 ).otherwise(e_raw)
    return agg.select(
        *group_cols,
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.round(est, 4).alias("hll_est"))


# ---------------------------------------------------- histogram quantiles
def hist_quantile(df: DataFrame, group_cols: list[str], value_col: str,
                  q: float = 0.5, bins: int = 256) -> DataFrame:
    """Mergeable equi-width histogram quantile (the fixed-range cousin of
    a t-digest, chosen because it is EXACTLY reproducible in ANSI SQL):
    per group, [min, max] is found in one pass, values are binned, and
    the quantile is linearly interpolated inside the bin where the
    cumulative count crosses q*n.

    Returns (group..., n, est_q).  All arithmetic is f64 on exact integer
    counts, with a deterministic bin-order fold -- Spark and the SQL
    oracle agree bit-for-bit before the final rounding.  Mergeable: bin
    counts add across datasets (same lo/hi).

    At 100 TB: two scans (min/max, bin counts), shuffles carry only
    (group, bin) partials with map-side combine -- the same shape as
    approx_percentile but with a cross-engine-verifiable definition.
    """
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    rng = df.groupBy(*g).agg(F.min(v).alias("lo"), F.max(v).alias("hi"),
                             F.count(v).alias("n"))
    j = df.join(F.broadcast(rng), g)
    width = (F.col("hi") - F.col("lo")) / bins
    bin_ = F.when(F.col("hi") > F.col("lo"),
                  F.least(F.floor((v - F.col("lo")) / width),
                          F.lit(bins - 1))).otherwise(0).cast("int")
    counts = j.groupBy(*g, bin_.alias("bin")).agg(F.count("*").alias("c"))
    packed = counts.groupBy(*g).agg(
        F.array_sort(F.collect_list(F.struct("bin", "c"))).alias("h"))
    packed = packed.join(rng, g)
    # rank of the quantile in the sorted multiset (0-based, continuous):
    # r = q*(n-1); find bin where cumulative count exceeds r, interpolate
    # uniformly inside the bin.
    r = F.lit(q) * (F.col("n").cast("double") - 1)
    # fold: (cum, est); when cum first passes r, est = lo + width *
    # (bin + (r - cum_before)/c_bin ... ) using the in-bin uniform model
    fold = F.aggregate(
        F.col("h"),
        F.struct(F.lit(0.0).alias("cum"), F.lit(None).cast("double")
                 .alias("est")),
        lambda acc, x: F.struct(
            (acc["cum"] + x["c"]).alias("cum"),
            F.when(acc["est"].isNotNull(), acc["est"])
            .when(acc["cum"] + x["c"] > r,
                  F.col("lo")
                  + ((F.col("hi") - F.col("lo")) / bins)
                  * (x["bin"]
                     + (r - acc["cum"]) / x["c"].cast("double")))
            .otherwise(F.lit(None).cast("double")).alias("est")))
    est = F.when(F.col("hi") > F.col("lo"), fold["est"]) \
        .otherwise(F.col("lo"))
    return packed.select(*g, F.col("n").cast("long").alias("n"),
                         F.round(est, 6).alias("est_q"))


# ------------------------------------------------- count-min heavy hitters
CMS_D = 4                                  # hash rows (seeds)
CMS_W = 64                                 # buckets per row


def cms_heavy_hitters(df: DataFrame, value_col: str, k: int = 20,
                      d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Count-min sketch next to exact counts for the top-k values:
    (v, exact, cms_est), cms_est >= exact always (one-sided error).

    The third mergeable sketch beside hll_distinct and hist_quantile:
    the sketch is a d x w integer matrix (groupBy (seed, bucket) with
    map-side combine -- merge across datasets = cell-wise SUM), the
    estimate is the MIN over the d rows a value hashes into.  Buckets
    come from the same portable md5-hex instr arithmetic as
    hll_distinct, so the SQL oracle reproduces the matrix and every
    estimate exactly.  ``w`` is deliberately small so fixture-scale
    collisions make the overestimate visibly non-vacuous.

    Top-k selection is on EXACT counts with a (count DESC, v) tie-break
    -- the deterministic baseline the sketch is judged against; at
    corpus scale the exact side drops and the sketch answers alone.
    """
    vals = df.select(F.col(value_col).cast("string").alias("v"))
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    hashed = vals.select("v", seeds).withColumn(
        "_h", F.md5(F.concat_ws("_", "v", "seed")))
    bucket = md5_bucket8("_h") % w
    cms = (hashed.withColumn("bucket", bucket)
           .groupBy("seed", "bucket").agg(F.count("*").alias("c")))
    top = (vals.groupBy("v").agg(F.count("*").alias("exact"))
           .orderBy(F.desc("exact"), "v").limit(k))
    tb = (top.select("v", F.explode(F.sequence(F.lit(0), F.lit(d - 1)))
                     .alias("seed"))
          .withColumn("_h", F.md5(F.concat_ws("_", "v", "seed")))
          .withColumn("bucket", bucket))
    return (tb.join(cms, ["seed", "bucket"])
            .groupBy("v").agg(F.min("c").cast("long").alias("cms_est"))
            .join(top, "v")
            .select("v", F.col("exact").cast("long").alias("exact"),
                    "cms_est"))
