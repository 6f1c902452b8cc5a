"""incremental_dedup verdicts: corpus match beats shard clustering,
canonical-min keep inside the shard, corpus-corpus pairs never generated."""
import pytest
from pyspark.sql import functions as F

from terraspark.datapipe import dedup

A = "the quick brown fox jumps over the lazy dog near the riverbank today"
B = "pack my box with five dozen liquor jugs before the winter storm hits"
C = "sphinx of black quartz judge my vow while the orchestra keeps playing"
D = "completely novel content about distributed dataflow engines and tiles"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_verdicts(spark):
    corpus = _df(spark, [(0, A), (1, B), (2, C)])
    new = _df(spark, [
        (100, A),        # exact corpus copy -> corpus_dup
        (101, D), (102, D),  # identical fresh pair -> kept + shard_dup
        (103, "another unique document that matches nothing else at all"),
    ])
    got = {r["doc_id"]: r["verdict"] for r in
           dedup.incremental_dedup(corpus, new).collect()}
    assert got == {100: "corpus_dup", 101: "kept",
                   102: "shard_dup", 103: "kept"}


def test_corpus_match_beats_shard_clustering(spark):
    # two shard copies of a corpus doc: BOTH are corpus_dup, neither is
    # reclassified as shard_dup (the corpus pass wins)
    corpus = _df(spark, [(0, A), (1, B)])
    new = _df(spark, [(100, A), (101, A)])
    got = {r["doc_id"]: r["verdict"] for r in
           dedup.incremental_dedup(corpus, new).collect()}
    assert got == {100: "corpus_dup", 101: "corpus_dup"}


def test_corpus_corpus_pairs_ignored(spark):
    # a corpus containing internal dups must not affect the shard result
    # (corpus-corpus pairs are never generated or verified)
    corpus = _df(spark, [(0, A), (1, A), (2, A), (3, B)])
    new = _df(spark, [(100, C)])
    got = dedup.incremental_dedup(corpus, new).collect()
    assert [(r["doc_id"], r["verdict"]) for r in got] == [(100, "kept")]
