"""Bloom-filter join pruning: build a tiny mergeable filter over the
build side's join keys, prune the probe side BEFORE its shuffle.

This is the engine analogue of Spark's runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) and of dynamic
partition pruning: at 100 TB the probe side of a selective join is the
dominant scan+shuffle cost, and a few-KB filter built from the dimension
side eliminates most of it map-side.  Here the filter is represented as
a DISTINCT (hash_index, position) table rather than a packed bitset so
that (a) it stays a plain DataFrame the optimizer can broadcast and
(b) the DuckDB oracle can recompute it bit-for-bit with the same integer
arithmetic -- the semantics (k independent hashes, positions mod m,
membership = all k positions present, false positives possible but no
false negatives) are exactly those of the packed form.

Hash family: h_j(key) = ((a_j * key + b_j) mod P) mod m with P = 2^31-1
(Mersenne prime) and fixed odd multipliers -- every product fits int64
for any int32 key, so Spark and ANSI SQL agree exactly.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 2_147_483_647                       # 2^31 - 1
DEFAULT_M = 16_384                      # positions per hash space
HASH_A = (2_654_435_761, 2_246_822_519, 3_266_489_917)
HASH_B = (97, 1_013, 30_011)


def _positions(df: DataFrame, key_col: str, m: int) -> DataFrame:
    """(key, j, pos) -- the k hash positions of every row's key."""
    pairs = ", ".join(
        f"struct({j} as j, ((({a}L * `{key_col}`) + {b}L) % {P}L) % {m} as pos)"
        for j, (a, b) in enumerate(zip(HASH_A, HASH_B)))
    return df.select(F.col(key_col).alias("key"),
                     F.expr(f"inline(array({pairs}))"))


def build_filter(build: DataFrame, key_col: str,
                 m: int = DEFAULT_M) -> DataFrame:
    """Distinct (j, pos) set -- the Bloom filter's set bits.

    At most k*m rows regardless of build cardinality (mergeable across
    partitions by plain DISTINCT), so it always broadcasts."""
    return _positions(build.select(key_col).distinct(), key_col, m) \
        .select("j", "pos").distinct()


def prune(probe: DataFrame, key_col: str, bits: DataFrame,
          m: int = DEFAULT_M) -> DataFrame:
    """Probe rows whose key passes the filter (all k positions set).

    The membership test is an inner join against the broadcast bit set
    followed by a HAVING count = k on the key -- map-side, before any
    probe-side shuffle.  Supersets the true semi-join (no false
    negatives); false positives are bounded by (1-e^(-kn/m))^k."""
    k = len(HASH_A)
    hit = (_positions(probe.select(key_col).distinct(), key_col, m)
           .join(F.broadcast(bits), ["j", "pos"])
           .groupBy("key").agg(F.count("*").alias("nh"))
           .where(F.col("nh") == k)
           .select(F.col("key").alias(key_col)))
    return probe.join(F.broadcast(hit), key_col)


def prune_audit(probe: DataFrame, probe_key: str, build: DataFrame,
                build_key: str, group_col: str,
                m: int = DEFAULT_M) -> DataFrame:
    """Per-group effectiveness audit of Bloom pruning probe x build.

    Returns (group, n_probe, n_pass, n_true, n_false_pos): probe rows
    passing the filter vs the true semi-join, per ``group_col`` -- the
    numbers a query engine would log to decide whether the runtime
    filter pays for itself.  n_false_pos >= 0 always and n_pass >=
    n_true always (no false negatives) -- asserted by the oracle since
    both counts are recomputed independently."""
    bits = build_filter(build, build_key, m)
    passed = prune(probe, probe_key, bits, m) \
        .select(group_col, F.col(probe_key).alias("key"))
    true_keys = build.select(F.col(build_key).alias("key")).distinct()
    truth = (probe.select(group_col, F.col(probe_key).alias("key"))
             .join(F.broadcast(true_keys), "key"))
    g = probe.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_probe"))
    p = passed.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_pass"))
    t = truth.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_true"))
    return (g.join(p, group_col, "left").join(t, group_col, "left")
            .select(group_col,
                    "n_probe",
                    F.coalesce("n_pass", F.lit(0)).cast("long")
                    .alias("n_pass"),
                    F.coalesce("n_true", F.lit(0)).cast("long")
                    .alias("n_true"),
                    (F.coalesce("n_pass", F.lit(0))
                     - F.coalesce("n_true", F.lit(0))).cast("long")
                    .alias("n_false_pos")))
