"""Winnowing fingerprint selection (dedup.winnowing) properties."""
from pyspark.sql import functions as F

from terraspark.datapipe import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_winnowing_counts_and_bounds(spark):
    text = " ".join(f"w{i % 7}" for i in range(30))   # 30 words, k=3 -> 28 grams
    out = dedup.winnowing(_docs(spark, [("a", text)]), k=3, w=4).collect()[0]
    assert out["n_grams"] == 28
    assert out["n_windows"] == 25
    # every window selects exactly one position; dedup across windows
    assert 1 <= out["n_selected"] <= out["n_windows"]
    assert out["sel_ratio"] == round(out["n_selected"] / 25, 6)
    # winnowing density is ~2/(w+1); with w=4 expect far fewer than 25
    assert out["n_selected"] < 25


def test_winnowing_identical_docs_agree(spark):
    text = " ".join(f"tok{i * 13 % 11}" for i in range(40))
    out = {r["doc_id"]: r for r in dedup.winnowing(
        _docs(spark, [("a", text), ("b", text)]), k=3, w=4).collect()}
    assert out["a"]["n_selected"] == out["b"]["n_selected"]
    assert out["a"]["n_grams"] == out["b"]["n_grams"]


def test_winnowing_short_doc_floor(spark):
    # fewer than k words: the house shingle convention floors n_grams
    # and n_windows at 1, so the doc still emits one fingerprint
    out = dedup.winnowing(_docs(spark, [("s", "just two")]),
                          k=3, w=4).collect()[0]
    assert out["n_grams"] == 1
    assert out["n_windows"] == 1
    assert out["n_selected"] == 1
    assert out["sel_ratio"] == 1.0


def test_winnowing_repeated_gram_rightmost(spark):
    # a fully repetitive doc has ONE distinct gram hash; rightmost-min
    # tie-break means each window selects its RIGHTMOST position, so
    # every window picks a different position -> n_selected == n_windows
    text = " ".join(["x"] * 20)        # 18 grams, all identical
    out = dedup.winnowing(_docs(spark, [("r", text)]), k=3, w=4).collect()[0]
    assert out["n_grams"] == 18
    assert out["n_windows"] == 15
    assert out["n_selected"] == 15


def test_winnowing_deterministic(spark):
    rows = [(f"d{i}", " ".join(f"a{j * i % 5}" for j in range(25)))
            for i in range(6)]
    a = sorted(map(tuple, dedup.winnowing(_docs(spark, rows)).collect()))
    b = sorted(map(tuple, dedup.winnowing(_docs(spark, rows)).collect()))
    assert a == b
