"""Checkpoint/resume: byte-identical output, no duplicate partitions,
per-partition lineage metrics."""
import os
import shutil

import pytest
from pyspark.sql import functions as F

from terraspark.lineage import StageRunner


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path / "run1")


def _input(spark, n=1000):
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 7).alias("g"),
        (F.col("id") * 2.5).alias("v"))


def _fn(df):
    return df.withColumn("v2", F.col("v") * 2)


def test_full_run_then_resume_noop(spark, tmp_root):
    r = StageRunner(spark, tmp_root, buckets=8)
    out1 = r.run_stage_batched("double", _input(spark), _fn, ["id"])
    rows1 = sorted(tuple(x) for x in out1.collect())
    man1 = {m["part_id"]: m["ts"] for m in r.manifest("double")}
    assert len(man1) == 8
    # resume: nothing to do, manifests untouched, identical output
    out2 = r.run_stage_batched("double", _input(spark), _fn, ["id"])
    rows2 = sorted(tuple(x) for x in out2.collect())
    assert rows1 == rows2
    man2 = {m["part_id"]: m["ts"] for m in r.manifest("double")}
    assert man1 == man2


def test_partial_crash_resume(spark, tmp_root):
    """Simulate a crash after half the buckets committed: rerun completes
    only the missing buckets; final output equals a single-shot run with
    no duplicates."""
    r = StageRunner(spark, tmp_root, buckets=8)
    inp = _input(spark)
    # single-shot reference
    ref_root = tmp_root + "_ref"
    ref = StageRunner(spark, ref_root, buckets=8)
    expect = sorted(tuple(x) for x in
                    ref.run_stage_batched("double", inp, _fn, ["id"]).collect())

    # "crashed" first attempt: only buckets 0..3 committed
    part = F.pmod(F.xxhash64("id"), F.lit(8)).cast("int")
    half = inp.withColumn("part_id", part).where(F.col("part_id") < 4)
    out = _fn(half.drop("part_id")).withColumn("part_id", part)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out.write.partitionBy("part_id").mode("overwrite").parquet(
        os.path.join(tmp_root, "double", "data"))
    for pid in range(4):
        r._commit("double", pid, 0, 0.0)

    before = r.completed_buckets("double")
    assert before == {0, 1, 2, 3}
    got = r.run_stage_batched("double", inp, _fn, ["id"])
    rows = sorted(tuple(x) for x in got.collect())
    assert rows == expect                       # byte-identical, no dupes
    assert r.completed_buckets("double") == set(range(8))


def test_lineage_metrics_present(spark, tmp_root):
    r = StageRunner(spark, tmp_root, buckets=4)
    r.run_stage_batched("s", _input(spark, 100), _fn, ["id"])
    man = r.manifest("s")
    assert len(man) == 4
    assert sum(m["rows"] for m in man) == 100
    for m in man:
        assert m["wall_ms"] >= 0 and "ts" in m
