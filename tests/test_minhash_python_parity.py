"""Bit-parity of the mapInPandas shingle-MinHash vs the JVM expression
form it replaced (r6 optimization): same shingling (substring semantics),
same md5, same per-seed minima -- asserted exceptAll-empty both ways on
real fixture docs plus adversarial edge cases."""
import pytest
from pyspark.sql import functions as F

from terraspark.datapipe import dedup
from terraspark.datapipe.dedup import _seed_mins
from terraspark.datapipe.util import spread_input


def _jvm_shingle_signature(docs, k=5, seeds=4):
    """The pre-r6 JVM expression implementation, kept verbatim as the
    parity reference."""
    shingles = spread_input(docs).select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(
            f"transform(sequence(1, greatest(length(text) - {k - 1}, 1)), "
            f"i -> substring(text, i, {k}))"))).alias("sh"))
    return _seed_mins(shingles, "sh", seeds)


EDGE_TEXTS = [
    (1, ""),                              # empty -> one empty shingle
    (2, "abc"),                           # shorter than k
    (3, "abcde"),                         # exactly k
    (4, "abcdef"),                        # k + 1
    (5, "aaaaaaaaaaaa"),                  # one distinct shingle
    (6, "naïve café ☃ snowman text"),   # non-ASCII codepoints
    (7, "word " * 40),                    # high shingle multiplicity
    (8, "The quick brown fox jumps over the lazy dog"),
]


@pytest.mark.parametrize("k,seeds", [(5, 4), (5, 12), (3, 2)])
def test_python_matches_jvm_edge_cases(spark, k, seeds):
    docs = spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")
    got = dedup.minhash_shingle_signature(docs, k=k, seeds=seeds)
    exp = _jvm_shingle_signature(docs, k=k, seeds=seeds)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_python_matches_jvm_fixture_docs(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    got = dedup.minhash_shingle_signature(docs, k=5, seeds=12)
    exp = _jvm_shingle_signature(docs, k=5, seeds=12)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_string_doc_ids(spark):
    docs = spark.createDataFrame(
        [("a", "hello world text"), ("b", "hello world text")],
        "doc_id string, text string")
    out = dedup.minhash_shingle_signature(docs, k=5, seeds=2).collect()
    assert len(out) == 4
    a = sorted(r["minhash"] for r in out if r["doc_id"] == "a")
    b = sorted(r["minhash"] for r in out if r["doc_id"] == "b")
    assert a == b


def test_null_text_dropped(spark):
    docs = spark.createDataFrame([(1, None), (2, "abcdef")],
                                 "doc_id long, text string")
    out = dedup.minhash_shingle_signature(docs, k=5, seeds=3)
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 2, 2]
