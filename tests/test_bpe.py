"""BPE merge learning: textbook merges, greedy-after-merge rewrite,
deterministic tie-break, early stop, partition invariance."""
import pytest
from pyspark.sql import functions as F

from terraspark.datapipe import bpe


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")


def test_textbook_merges(spark):
    docs = _docs(spark, ["low low low", "lower lower", "newest"])
    got = [(r["round"], r["a"], r["b"], r["n"])
           for r in bpe.learn_bpe(docs, n_merges=4).collect()]
    # 'lo' appears in low(3) + lower(2) = 5; then 'lo'+'w' = 5; then the
    # 2-count pairs resolve by (a, b) tie-break: ('e','r') < ('er',...)
    assert got == [(0, "l", "o", 5), (1, "lo", "w", 5),
                   (2, "e", "r", 2), (3, "low", "er", 2)]


def test_greedy_after_merge(spark):
    # 'aaaa' x2: pair (a,a) counts 3 per word = 6; after merging, words
    # are [aa, aa] so round 2 merges (aa, aa) with count 2 -- never a
    # re-overlapping [aa, a] or count-4 artifact
    docs = _docs(spark, ["aaaa aaaa"])
    got = [(r["a"], r["b"], r["n"])
           for r in bpe.learn_bpe(docs, n_merges=2).collect()]
    assert got == [("a", "a", 6), ("aa", "aa", 2)]


def test_tie_break_is_lexicographic(spark):
    # 'xy' and 'ab' both count 1: (a,b) must win over (x,y)
    docs = _docs(spark, ["xy ab"])
    got = bpe.learn_bpe(docs, n_merges=1).collect()[0]
    assert (got["a"], got["b"]) == ("a", "b")


def test_early_stop_when_no_pairs_remain(spark):
    docs = _docs(spark, ["ab ab"])
    got = bpe.learn_bpe(docs, n_merges=5).collect()
    # one merge fuses every word into a single symbol; later rounds stop
    assert len(got) == 1
    assert (got[0]["a"], got[0]["b"]) == ("a", "b")


def test_partition_invariance(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .select("doc_id", "text")
    a = bpe.learn_bpe(docs.repartition(1), n_merges=4).collect()
    b = bpe.learn_bpe(docs.repartition(9, "text"), n_merges=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_segment_counts(spark):
    docs = _docs(spark, ["low low lower", "newest low"])
    merges = [(r["a"], r["b"]) for r in
              bpe.learn_bpe(docs, n_merges=2).collect()]
    assert merges == [("l", "o"), ("lo", "w")]
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"]) for r in
           bpe.segment_counts(docs, merges).collect()}
    # after (l,o)+(lo,w): low=[low]=1, lower=[low,e,r]=3,
    # newest=[n,e,w,e,s,t]=6 ('w' inside newest is a mid-word symbol,
    # merged only when adjacent to 'lo')
    assert got == {0: (3, 1 + 1 + 3), 1: (2, 6 + 1)}


def test_segment_with_no_merges_counts_chars(spark):
    docs = _docs(spark, ["ab cde"])
    got = bpe.segment_counts(docs, []).collect()[0]
    assert (got["n_words"], got["n_bpe_tokens"]) == (2, 5)
