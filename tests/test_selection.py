"""DSIR importance weights: hand-replicated formula, target-domain
docs outscore off-domain docs, partition invariance."""
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from terraspark.datapipe import selection

SF_DIR = "/root/testdata/sf0.01"


def _bucket(tok):
    return int(hashlib.md5(tok.encode()).hexdigest()[:2], 16)


def _expected(raw, target, alpha=0.5, n_buckets=256):
    def counts(docs):
        c = {}
        for _, text in docs:
            for t in text.split(" "):
                b = _bucket(t)
                c[b] = c.get(b, 0) + 1
        return c, sum(c.values())
    rc, rtot = counts(raw)
    tc, ttot = counts(target)
    out = {}
    for doc_id, text in raw:
        w = 0.0
        for t in text.split(" "):
            b = _bucket(t)
            w += (math.log((tc.get(b, 0) + alpha)
                           / (ttot + alpha * n_buckets))
                  - math.log((rc[b] + alpha) / (rtot + alpha * n_buckets)))
        out[doc_id] = (len(text.split(" ")), round(w, 6))
    return out


def test_hand_replication(spark):
    raw = [(0, "alpha beta gamma"), (1, "delta delta epsilon"),
           (2, "alpha zeta"), (3, "eta theta iota kappa")]
    target = [(0, "alpha beta gamma"), (2, "alpha zeta")]
    rdf = spark.createDataFrame(raw, "doc_id bigint, text string")
    tdf = spark.createDataFrame(target, "doc_id bigint, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["dsir_weight"])
           for r in selection.dsir_weights(rdf, tdf).collect()}
    exp = _expected(raw, target)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], abs=2e-6)
    # target members score higher than the unrelated doc
    assert got[0][1] > got[3][1] and got[2][1] > got[3][1]


def test_target_domain_separates(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = selection.dsir_weights(
        docs.select("doc_id", "text"),
        docs.where(F.col("lang") == "en").select("doc_id", "text"))
    per_lang = (w.join(docs.select("doc_id", "lang"), "doc_id")
                .groupBy("lang")
                .agg(F.avg(F.col("dsir_weight") / F.col("n_tokens"))
                     .alias("m")))
    means = {r["lang"]: r["m"] for r in per_lang.collect()}
    assert means["en"] == max(means.values())
    assert all(means["en"] > means[l] for l in means if l != "en")


def test_partition_invariance(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    tgt = docs.where(F.col("doc_id") % 3 == 0)
    a = {r["doc_id"]: r["dsir_weight"] for r in
         selection.dsir_weights(docs.repartition(1), tgt).collect()}
    b = {r["doc_id"]: r["dsir_weight"] for r in
         selection.dsir_weights(docs.repartition(13, "text"), tgt).collect()}
    assert a == b
