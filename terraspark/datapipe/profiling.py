"""Dataset profiling operators: per-column quality stats and
per-dimension embedding statistics.

The first thing a pipeline owner runs against a new 100 TB drop is a
profile -- null rates, cardinalities, value ranges -- and the first step
of embedding-space work (normalization, whitening, outlier screens) is
per-dimension moments.  Both are single-pass aggregations with exact
DuckDB-SQL twins in __spark_entry__.py.

The reference has no profiling surface (its closest shape is the
per-band stats bundle, /root/reference/processing_alg/topocorrection_eval/
multi_criteria_eval.py:140-144); these are engine additions in the same
"stats table as the contract" style.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import spread_input


def profile_table(df: DataFrame, string_cols: list[str],
                  numeric_cols: list[str]) -> DataFrame:
    """One row per profiled column: (col, n_null, n_distinct, vmin,
    vmax, vavg) -- vmin/vmax/vavg are the numeric range/mean for
    ``numeric_cols`` and NULL for ``string_cols``.

    Distributed shape: ONE aggregation pass computes every per-column
    measure (Spark expands the multi-count-distinct internally, the
    same plan a hand-written grouping-sets profile would get), then a
    zero-shuffle ``stack`` unpivots the single aggregate row into the
    per-column contract table.  Exact count_distinct is deliberate --
    the profile IS the audit, and the oracle must match bit-for-bit;
    swap in approx_count_distinct only where a ±2% answer is
    acceptable."""
    import re
    for c in [*string_cols, *numeric_cols]:
        # column names are interpolated into the stack() SQL string and
        # the agg aliases below; anything beyond identifier characters
        # would produce a parse error or a malformed literal (ADVICE r5)
        if not re.fullmatch(r"[A-Za-z0-9_]+", c):
            raise ValueError(f"profile_table: column name {c!r} must "
                             "match [A-Za-z0-9_]+")
    aggs = []
    for c in string_cols + numeric_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"mx_{c}"))
        aggs.append(F.avg(F.col(c).cast("double")).alias(f"av_{c}"))
    one = spread_input(df).agg(*aggs)
    parts = []
    for c in string_cols:
        parts.append(f"'{c}', nn_{c}, nd_{c}, CAST(NULL AS DOUBLE), "
                     f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)")
    for c in numeric_cols:
        parts.append(f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}, "
                     f"ROUND(av_{c}, 6)")
    k = len(parts)
    return one.select(F.expr(
        f"stack({k}, {', '.join(parts)}) AS "
        f"(col, n_null, n_distinct, vmin, vmax, vavg)"))


def embed_dim_stats(emb: DataFrame) -> DataFrame:
    """Per-dimension moments of an array<float> embedding column:
    (dim, n, dmean, dstd, dmin, dmax) -- the normalization-constant /
    whitening-input table.

    Distributed shape: posexplode + one map-side-combinable groupBy on
    the dimension index (a handful of groups, perfectly balanced);
    floats are widened to f64 BEFORE the fold exactly like the oracle,
    std via the sum-of-squares identity (the focal_stats convention,
    4-dp round; mean at 6 dp)."""
    ex = (spread_input(emb)
          .select(F.posexplode("embedding").alias("dim", "v"))
          .select("dim", F.col("v").cast("double").alias("v")))
    n = F.count("*")
    s = F.sum("v")
    ss = F.sum(F.col("v") * F.col("v"))
    return (ex.groupBy("dim")
            .agg(n.cast("long").alias("n"),
                 F.round(s / n, 6).alias("dmean"),
                 F.round(F.sqrt(F.greatest(ss / n - (s / n) * (s / n),
                                           F.lit(0.0))), 4).alias("dstd"),
                 F.min("v").alias("dmin"),
                 F.max("v").alias("dmax")))
