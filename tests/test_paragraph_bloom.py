"""Paragraph-level dedup (first-occurrence retention + reassembly) and
Bloom-filter join pruning semantics."""
import pytest
from pyspark.sql import functions as F

from terraspark.datapipe import bloom, dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------ paragraph
def test_paragraph_first_occurrence_and_reassembly(spark):
    # doc 1 chunk "a b c" (words 0-9 with cw=3? use cw=3 for readability)
    # chunks of 3 words: doc1 = [x y z][p q r], doc2 = [p q r][u v w]
    # "p q r" first occurs in doc1 grp1 -> doc2 keeps only [u v w].
    rows = [(1, "x y z p q r"), (2, "p q r u v w")]
    out = {r["doc_id"]: r for r in
           dedup.paragraph_dedup(_docs(spark, rows), chunk_words=3)
           .collect()}
    assert out[1]["n_paras"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_paras"] == 2 and out[2]["n_kept"] == 1
    import hashlib
    assert out[1]["kept_md5"] == hashlib.md5(b"x y z p q r").hexdigest()
    assert out[2]["kept_md5"] == hashlib.md5(b"u v w").hexdigest()


def test_paragraph_fully_duplicate_doc_keeps_nothing(spark):
    rows = [(1, "a b c"), (2, "a b c")]
    out = {r["doc_id"]: r for r in
           dedup.paragraph_dedup(_docs(spark, rows), chunk_words=3)
           .collect()}
    assert out[1]["n_kept"] == 1
    assert out[2]["n_kept"] == 0 and out[2]["kept_md5"] is None


def test_paragraph_within_doc_repeat_kept_once(spark):
    # the SAME chunk repeated inside one doc: only its first grp survives
    rows = [(5, "a b c a b c d e f")]
    out = dedup.paragraph_dedup(_docs(spark, rows), chunk_words=3).collect()
    assert out[0]["n_paras"] == 3 and out[0]["n_kept"] == 2
    import hashlib
    assert out[0]["kept_md5"] == hashlib.md5(b"a b c d e f").hexdigest()


def test_paragraph_short_tail_chunk(spark):
    rows = [(1, "a b c d")]          # cw=3 -> [a b c][d]
    out = dedup.paragraph_dedup(_docs(spark, rows), chunk_words=3).collect()
    assert out[0]["n_paras"] == 2 and out[0]["n_kept"] == 2


# ----------------------------------------------------------------- bloom
@pytest.fixture(scope="module")
def bloom_tables(spark):
    build = spark.createDataFrame(
        [(k,) for k in range(0, 2000, 2)], "key int")       # even keys
    probe = spark.createDataFrame(
        [(k, k % 7) for k in range(3000)], "key int, grp int")
    return build, probe


def test_bloom_no_false_negatives(spark, bloom_tables):
    build, probe = bloom_tables
    bits = bloom.build_filter(build, "key")
    kept = set(r["key"] for r in
               bloom.prune(probe, "key", bits).select("key").collect())
    truth = set(range(0, 2000, 2))
    assert truth <= kept                     # every true key passes


def test_bloom_audit_counts_consistent(spark, bloom_tables):
    build, probe = bloom_tables
    audit = bloom.prune_audit(probe, "key", build, "key", "grp").collect()
    assert len(audit) == 7
    for r in audit:
        assert r["n_pass"] >= r["n_true"]
        assert r["n_false_pos"] == r["n_pass"] - r["n_true"]
        assert r["n_probe"] >= r["n_pass"]
    # totals: every even key < 2000 is true
    assert sum(r["n_true"] for r in audit) == 1000


def test_bloom_bitset_is_bounded_and_broadcast(spark, bloom_tables):
    build, probe = bloom_tables
    bits = bloom.build_filter(build, "key")
    assert bits.count() <= 3 * bloom.DEFAULT_M
    plan = bloom.prune(probe, "key", bits)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------- mixture
def test_temperature_mixture_upweights_small_source(spark):
    import math
    from terraspark.datapipe import mixture
    rows = [(i, "big" if i < 8 else "small") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["source"]: r for r in
           mixture.temperature_mixture(docs).collect()}
    assert out["big"]["n_docs"] == 8 and out["small"]["n_docs"] == 2
    # identical IEEE arithmetic as the engine/oracle formula
    denom = math.sqrt(8.0) + math.sqrt(2.0)
    for src, n in (("big", 8), ("small", 2)):
        w = math.sqrt(float(n)) / denom
        p = min(1.0, 0.5 * 10.0 * w / n)
        assert out[src]["weight"] == round(w, 6)
        assert out[src]["p_sample"] == round(p, 6)
        exp = sum(1 for i in range(10)
                  if rows[i][1] == src
                  and (48271 * ((48271 * i + 11) % 2147483647)
                       + 11) % 2147483647
                  < math.floor(p * 2147483647))
        assert out[src]["n_sampled"] == exp
    # temperature upweights the small source's per-doc probability
    assert out["small"]["p_sample"] > out["big"]["p_sample"]


def test_temperature_mixture_caps_p_at_one(spark):
    from terraspark.datapipe import mixture
    rows = [(i, "big" if i < 97 else "tiny") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["source"]: r for r in
           mixture.temperature_mixture(docs).collect()}
    assert out["tiny"]["p_sample"] == 1.0       # capped
    assert out["tiny"]["n_sampled"] == 3        # all kept


# ------------------------------------------------------------ skew audit
def test_key_skew_audit_surfaces_hot_key(spark):
    from terraspark.datapipe.util import key_skew_audit
    rows = [(k,) for k in range(20)] + [(7,)] * 80
    df = spark.createDataFrame(rows, "key int")
    out = key_skew_audit(df, "key", top=3).collect()
    assert out[0]["key"] == 7 and out[0]["rnk"] == 1
    assert out[0]["n_rows"] == 81
    assert out[0]["share"] == round(81 / 100, 6)
    # 20 distinct keys, mean 5 rows -> straggler factor 16.2
    assert out[0]["skew"] == round(81 / 5.0, 4)
    assert out[1]["n_rows"] == 1 and out[1]["key"] == 0   # tie -> key asc


def test_mixture_draw_sign_and_overflow_safe(spark):
    """Negative or huge doc ids must go through the same [0, P) MINSTD
    draw as everyone else -- Spark's signed % would otherwise keep every
    negative-id row regardless of p_sample, and LCG_A * id overflows
    int64 for ids >= ~1.9e14."""
    from pyspark.sql import functions as F
    from terraspark.datapipe import mixture
    big = 1 << 62
    docs = spark.createDataFrame(
        [(i, "s") for i in range(200)]
        + [(-i, "s") for i in range(1, 201)]
        + [(big + i, "s") for i in range(200)],
        "doc_id long, source string")
    kept = mixture.sample_docs(docs, rate=0.3)
    grp = (F.when(F.col("doc_id") < 0, -1)
           .when(F.col("doc_id") >= big, 2).otherwise(1))
    counts = {int(r["g"]): r["count"]
              for r in kept.groupBy(grp.alias("g")).count().collect()}
    # every id class must be sampled at roughly p (=0.3 here): a signed-%
    # bug keeps ALL 200 negative ids; overflow keeps/drops arbitrarily
    # but deterministically differs from the pmod draw
    assert 0 < counts.get(-1, 0) < 200, counts
    assert 0 < counts.get(1, 0) < 200, counts
    assert 0 < counts.get(2, 0) < 200, counts
