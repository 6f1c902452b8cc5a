"""Sequence-packing invariants: budget respected, every doc placed
exactly once, partition-invariance, truncation cap, NFD determinism."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from terraspark.datapipe.packing import pack_sequences, packing_stats

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_bins_respect_budget_and_cover_all_docs(spark, docs):
    budget = 256
    packed = pack_sequences(docs, budget=budget).toPandas()
    # every doc exactly once
    assert packed["doc_id"].is_unique
    assert len(packed) == docs.count()
    # no bin over budget (bin identity is (grp, bin))
    fills = packed.groupby(["grp", "bin"])["n_tokens"].sum()
    assert (fills <= budget).all(), fills[fills > budget]
    # packing is non-trivial: strictly fewer bins than docs
    assert len(fills) < len(packed)


def test_partition_invariance(spark, docs):
    a = pack_sequences(docs.repartition(1)).toPandas()
    b = pack_sequences(docs.repartition(13, "text")).toPandas()
    key = ["grp", "doc_id", "n_tokens", "truncated", "bin"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(key).reset_index(drop=True),
        b[key].sort_values(key).reset_index(drop=True))


def test_truncation_cap(spark):
    rows = [(0, "w " * 999 + "w"), (1, "a b c"), (8, "d e")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in
           pack_sequences(df, budget=16).collect()}
    assert got[0]["truncated"] and got[0]["n_tokens"] == 16
    assert not got[1]["truncated"] and got[1]["n_tokens"] == 3
    # doc 0 and doc 8 share grp 0; 16 + 2 > 16 so they get separate
    # bins, the truncated (larger) doc first under NFD
    assert got[0]["grp"] == got[8]["grp"] == 0
    assert got[0]["bin"] == 0 and got[8]["bin"] == 1
    # doc 1 is alone in grp 1
    assert got[1]["grp"] == 1 and got[1]["bin"] == 0


def test_stats_consistency(spark, docs):
    budget = 256
    packed = pack_sequences(docs, budget=budget)
    stats = packing_stats(packed, budget=budget).toPandas()
    pdf = packed.toPandas()
    for _, r in stats.iterrows():
        grp = pdf[pdf["grp"] == r["grp"]]
        fills = grp.groupby("bin")["n_tokens"].sum()
        assert r["n_bins"] == len(fills)
        assert r["n_docs"] == len(grp)
        assert abs(r["mean_fill"] - (fills / budget).mean()) < 1e-6
        assert abs(r["waste"]
                   - (1 - fills.sum() / (len(fills) * budget))) < 1e-6
    # sanity: NFD on heavy-tailed short docs should fill bins well
    assert (stats["mean_fill"] > 0.5).all()
