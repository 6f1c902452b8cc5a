"""As-of join edge semantics + two-level stratified-sample equivalence.

The driver verifies rel_asof_join / dp_sample_stratified / dp_vocab_topk
against DuckDB; these tests pin the edge cases the fixture data may not
exercise (equal timestamps, no-prior-view clicks, two-level == global).
"""
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F


def _asof(spark, events):
    ev = spark.createDataFrame(
        pd.DataFrame(events,
                     columns=["event_id", "user_id", "event_type", "ts_us"]),
        "event_id long, user_id long, event_type string, ts_us long")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts_us", F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"))
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.lit(1).alias("tag"), "event_id")
    w = Window.partitionBy("user_id").orderBy("ts_us", "tag") \
        .rowsBetween(Window.unboundedPreceding, 0)
    tagged = views.unionByName(clicks).withColumn(
        "view_us", F.max(F.when(F.col("tag") == 0, F.col("ts_us"))).over(w))
    return (tagged.where((F.col("tag") == 1) & F.col("view_us").isNotNull())
            .select("event_id", "user_id", "view_us").toPandas()
            .set_index("event_id"))


def test_asof_equal_ts_and_no_prior(spark):
    out = _asof(spark, [
        (1, 7, "view", 100),
        (2, 7, "click", 100),   # same instant: >= semantics matches it
        (3, 7, "click", 150),   # latest prior view = 100
        (4, 7, "view", 160),
        (5, 7, "click", 170),   # latest prior view = 160, not 100
        (6, 9, "click", 50),    # user 9 has no view at all -> dropped
        (7, 9, "view", 60),
        (8, 9, "click", 55),    # view exists but only later -> dropped
    ])
    assert dict(zip(out.index, out["view_us"])) == {2: 100, 3: 100, 5: 160}


def test_two_level_sample_equals_global(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(300),
                      "lang": ["en", "de", "es"] * 100}),
        "doc_id long, lang string")
    k = 10
    h = F.md5(F.col("doc_id").cast("string"))
    w1 = Window.partitionBy("lang", F.pmod("doc_id", F.lit(8))) \
        .orderBy(h.asc(), F.col("doc_id").asc())
    w2 = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    two = (docs.withColumn("rn1", F.row_number().over(w1))
           .where(F.col("rn1") <= k)
           .withColumn("rn", F.row_number().over(w2))
           .where(F.col("rn") <= k).select("lang", "doc_id", "rn"))
    glob = (docs.withColumn("rn", F.row_number().over(w2))
            .where(F.col("rn") <= k).select("lang", "doc_id", "rn"))
    t = two.toPandas().sort_values(["lang", "rn"]).reset_index(drop=True)
    g = glob.toPandas().sort_values(["lang", "rn"]).reset_index(drop=True)
    assert t.equals(g)
    assert (t.groupby("lang").size() == k).all()


def test_range_join_plans_as_equi_join(spark):
    """The bucket decomposition must plan as a broadcast HASH join on the
    bucket key -- never BroadcastNestedLoopJoin (the theta-join fallback
    that scans every (event, band) combination)."""
    import __spark_entry__ as E
    import os
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    df = E.queries()["rel_range_join"](spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
