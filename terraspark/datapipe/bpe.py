"""Distributed BPE merge learning (byte-pair encoding tokenizer training).

Sennrich-style BPE trains on the corpus WORD-FREQUENCY table, not the
raw text: each distinct word is a symbol sequence (initially single
characters) carrying its corpus count, and each round merges the
globally most frequent adjacent symbol pair.  That makes the iteration
state vocabulary-sized -- the 100 TB corpus is scanned ONCE for word
counts and never again.

Per round (all map-side-combined aggregations over the vocab table):

* pair counts: one JVM transform/explode over each word's symbol list,
  weighted by word count;
* best pair: global argmax with a deterministic (count DESC, a, b)
  tie-break -- a 1-row collect per round (the same driver-scalar shape
  as k-means centroids);
* rewrite: greedy left-to-right non-overlapping merge of (a, b) -> ab
  inside every word, as a pure-JVM ``aggregate`` lambda over the symbol
  array (no Python, no shuffle -- a map over the checkpointed vocab
  table).  Greedy-after-merge semantics: 'aaaa' under (a,a) becomes
  [aa, aa], never [aa, a, a] or a re-merged [aaaa].

The SQL oracle unrolls the identical rounds as CTE chains (the
Lloyd-in-SQL pattern) with DuckDB ``list_reduce`` reproducing the same
greedy rewrite, so learned merges are cross-checked end-to-end,
including tie-breaks.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .util import spread_input

MERGE_EXPR = """
    aggregate(sym, cast(array() as array<string>),
        (acc, x) -> CASE
            WHEN size(acc) > 0 AND element_at(acc, -1) = _a AND x = _b
            THEN concat(slice(acc, 1, size(acc) - 1), array(_a || _b))
            ELSE concat(acc, array(x)) END)
"""


def word_counts(docs: DataFrame) -> DataFrame:
    """(w, c): corpus word-frequency table (the only full-corpus pass)."""
    return (spread_input(docs)
            .select(F.explode(F.split("text", " ")).alias("w"))
            .where(F.col("w") != "")
            .groupBy("w").agg(F.count("*").alias("c")))


def learn_bpe(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns (round, a, b, n): merge rule of each round with its weighted
    pair count, in learning order.  Deterministic: ties broken by
    (a ASC, b ASC).  Stops early if no pair remains.
    """
    spark = docs.sparkSession
    cur = word_counts(docs).withColumn("sym", F.expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")) \
        .localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        pairs = (cur.where(F.size("sym") >= 2)
                 .select("c", F.explode(F.expr(
                     "transform(sequence(1, size(sym) - 1), "
                     "i -> struct(sym[i - 1] AS a, sym[i] AS b))"))
                     .alias("p"))
                 .select("c", "p.a", "p.b"))
        best = (pairs.groupBy("a", "b").agg(F.sum("c").alias("n"))
                .orderBy(F.desc("n"), "a", "b").limit(1).collect())
        if not best:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append((r, a, b, n))
        cur = (cur.withColumn("_a", F.lit(a)).withColumn("_b", F.lit(b))
               .withColumn("sym", F.expr(MERGE_EXPR))
               .drop("_a", "_b").localCheckpoint())
    return spark.createDataFrame(
        merges, "round int, a string, b string, n long")


def segment_counts(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply learned merges and count BPE tokens per document:
    (doc_id, n_words, n_bpe_tokens).

    The merge list is applied IN LEARNING ORDER to the distinct-word
    table only (each rule is one chained JVM lambda over the
    vocab-sized frame -- the corpus is never rewritten); the per-word
    subword count then joins back to the per-doc word occurrences
    (broadcast while the vocab fits) and one groupBy sums.  This is the
    tokenize step of the trained tokenizer: corpus cost is one explode
    + one join + one agg regardless of merge count.
    """
    toks = (spread_input(docs)
            .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
            .where(F.col("w") != ""))
    vocab = toks.select("w").distinct().withColumn("sym", F.expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
    for a, b in merges:
        vocab = (vocab.withColumn("_a", F.lit(a)).withColumn("_b", F.lit(b))
                 .withColumn("sym", F.expr(MERGE_EXPR)).drop("_a", "_b"))
    wtok = vocab.select("w", F.size("sym").alias("n_sub"))
    return (toks.join(F.broadcast(wtok), "w")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.sum("n_sub").cast("long").alias("n_bpe_tokens")))
