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
    bucket = ((F.expr(f"instr('{hexd}', substr(_h, 1, 1))") - 1) * 16
              + (F.expr(f"instr('{hexd}', substr(_h, 2, 1))") - 1))
    d = d.withColumn("_bucket", bucket) \
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
