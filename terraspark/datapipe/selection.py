"""Data selection via importance resampling weights (DSIR-style).

Given a small TARGET sample (the domain you want more of) and the RAW
corpus, score every raw document by how target-like it is: hashed
unigram features, add-alpha-smoothed bucket distributions p_target and
p_raw, and per-doc importance weight

    w(doc) = sum over token occurrences of ln(p_t[b] / p_r[b])

(the log-likelihood ratio of the doc under the two bag-of-buckets
models -- Xie et al., "Data Selection for Language Models via
Importance Resampling").  Selection then keeps the top-weighted docs or
samples proportionally; this operator produces the weights.

Distributed shape: one token explode over the raw corpus (the target
sample is typically tiny); BOTH distributions reduce to <= n_buckets
rows via map-side-combined counts; the per-bucket log-ratio table
(256 rows by default) broadcast-joins back to the token stream and one
groupBy(doc_id) sums the weight.  The corpus text is scanned once and
never shuffled; everything that moves is (doc_id, bucket) int rows.

Feature hashing uses the first two md5 hex digits (256 buckets) via the
same instr() arithmetic as sketches.hll_distinct, so the SQL oracle
reproduces bucket ids and f64 weights bit-for-bit.  n_buckets=256 is
the fixture scale; production DSIR uses ~10^4-10^5 hashed n-gram
buckets -- the shape is unchanged (the ratio table stays driver-free
and broadcast-sized either way).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .util import md5_bucket8, spread_input

N_BUCKETS = 256
ALPHA = 0.5


def _bucketed_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket): one row per token OCCURRENCE (bag semantics),
    bucket = int of the first two md5 hex digits (0..255)."""
    toks = spread_input(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"))
    return toks.select(
        "doc_id", md5_bucket8("md5(tok)").cast("int").alias("bucket"))


def _bucket_counts(docs: DataFrame) -> DataFrame:
    return _bucketed_tokens(docs).groupBy("bucket") \
        .agg(F.count("*").alias("c"))


def dsir_weights(raw: DataFrame, target: DataFrame,
                 alpha: float = ALPHA,
                 n_buckets: int = N_BUCKETS) -> DataFrame:
    """(doc_id, n_tokens, dsir_weight) for every raw document.

    dsir_weight = sum_tokens ln(p_t[b]/p_r[b]) with
    p[b] = (count_b + alpha) / (total + alpha*n_buckets); rounded to 6dp
    AFTER the sum (one rounding point, mirrored in the SQL oracle).
    Positive = more target-like than the corpus average.
    """
    rt = _bucketed_tokens(raw)
    rc = _bucket_counts(raw)
    tc = _bucket_counts(target)
    totals = (rc.agg(F.sum("c").alias("rt")).crossJoin(
        tc.agg(F.sum("c").alias("tt"))))
    ratio = (rc.join(tc.withColumnRenamed("c", "ct"), "bucket", "left")
             .crossJoin(F.broadcast(totals))
             .select(
                 "bucket",
                 (F.log((F.coalesce("ct", F.lit(0)) + alpha)
                        / (F.col("tt") + alpha * n_buckets))
                  - F.log((F.col("c") + alpha)
                          / (F.col("rt") + alpha * n_buckets)))
                 .alias("lr")))
    return (rt.join(F.broadcast(ratio), "bucket")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.round(F.sum("lr"), 6).alias("dsir_weight")))


def train_split(docs: DataFrame, id_col: str = "doc_id",
                cut_train: int = 80, cut_val: int = 90) -> DataFrame:
    """(doc_id, split): deterministic, leakage-free train/val/test
    assignment -- split = f(md5(id)) so a document keeps its split under
    any reshuffling, re-sharding, or incremental reprocessing (the
    property a random() split silently loses, leaking val docs into a
    retrained model's train set).

    slot = first two md5 hex digits of the id string (0..255, the repo's
    portable :func:`md5_bucket8` convention) scaled to 0..99 via
    slot * 100 // 256; train iff < ``cut_train``, val iff < ``cut_val``,
    else test.  Pure JVM expression work -- one narrow scan, no shuffle.
    """
    slot = (md5_bucket8(f"md5(CAST({id_col} AS STRING))") * 100 / 256) \
        .cast("int")
    return docs.withColumn(
        "split",
        F.when(slot < cut_train, "train")
        .when(slot < cut_val, "val").otherwise("test"))


def split_audit(docs: DataFrame, source_col: str = "source",
                id_col: str = "doc_id", cut_train: int = 80,
                cut_val: int = 90) -> DataFrame:
    """(source, split, n_docs, frac): the distribution audit a split
    rollout gates on -- per-source split fractions should track the
    80/10/10 target; a skewed source (e.g. ids correlated with the
    hash) shows up immediately.  Two tiny aggs + a broadcast join."""
    s = train_split(docs.select(id_col, source_col), id_col,
                    cut_train, cut_val)
    cnt = s.groupBy(source_col, "split").agg(
        F.count("*").cast("long").alias("n_docs"))
    tot = cnt.groupBy(source_col).agg(F.sum("n_docs").alias("n_total"))
    return (cnt.join(F.broadcast(tot), source_col)
            .select(source_col, "split", "n_docs",
                    F.round(F.col("n_docs") / F.col("n_total"), 6)
                    .alias("frac")))
