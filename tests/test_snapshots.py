"""Snapshot table semantics: atomic visibility, time travel, rollback."""
import os

import pytest
from pyspark.sql import functions as F

from terraspark.snapshots import NoSuchSnapshotError, SnapshotTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"),
                                      (F.col("id") * 10).alias("v"))


def _keys(tbl, as_of=None):
    return sorted(r["k"] for r in tbl.read(as_of=as_of).collect())


def test_append_overwrite_time_travel(spark, tmp_path):
    tbl = SnapshotTable(spark, str(tmp_path / "t"))
    s0 = tbl.append(_df(spark, 0, 3))
    s1 = tbl.append(_df(spark, 3, 5))
    assert _keys(tbl) == [0, 1, 2, 3, 4]
    s2 = tbl.overwrite(_df(spark, 100, 102))
    assert _keys(tbl) == [100, 101]
    # time travel: earlier snapshots unchanged by the overwrite
    assert _keys(tbl, as_of=s0) == [0, 1, 2]
    assert _keys(tbl, as_of=s1) == [0, 1, 2, 3, 4]
    assert _keys(tbl, as_of=s2) == [100, 101]


def test_rollback_is_metadata_only_and_restores(spark, tmp_path):
    tbl = SnapshotTable(spark, str(tmp_path / "t"))
    tbl.append(_df(spark, 0, 3))
    s1 = tbl.append(_df(spark, 3, 5))
    tbl.overwrite(_df(spark, 100, 102))
    parts_before = sorted(os.listdir(tbl._data_dir()))
    s3 = tbl.rollback(s1)
    assert sorted(os.listdir(tbl._data_dir())) == parts_before  # no data moved
    assert _keys(tbl) == [0, 1, 2, 3, 4]
    # rolled-back-over snapshot still time-travelable
    assert _keys(tbl, as_of=s3 - 1) == [100, 101]
    ops = [m["op"] for m in tbl.history()]
    assert ops == ["append", "append", "overwrite", f"rollback[{s1}]"]


def test_uncommitted_data_is_invisible(spark, tmp_path):
    tbl = SnapshotTable(spark, str(tmp_path / "t"))
    tbl.append(_df(spark, 0, 2))
    # simulate a crash AFTER the data write, BEFORE the manifest commit:
    # land a data partition with no manifest -- readers must not see it
    (_df(spark, 50, 60).withColumn("snap_id", F.lit(99))
     .write.mode("append").partitionBy("snap_id")
     .parquet(tbl._data_dir()))
    assert _keys(tbl) == [0, 1]
    assert tbl.current_snapshot() == 0


def test_empty_table_read_raises(spark, tmp_path):
    tbl = SnapshotTable(spark, str(tmp_path / "t"))
    with pytest.raises(NoSuchSnapshotError):
        tbl.read()


def _ch(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, v bigint, _op string, _v int")


def test_merge_upsert_delete_insert(spark, tmp_path):
    tbl = SnapshotTable(spark, str(tmp_path / "t"))
    s0 = tbl.overwrite(_df(spark, 0, 5))       # k=0..4, v=k*10
    tbl.merge(spark.createDataFrame([
        (1, 111, "U"),           # update
        (3, None, "D"),          # delete
        (50, 500, "U"),          # insert
    ], "k bigint, v bigint, _op string"), ["k"])
    got = {r["k"]: r["v"] for r in tbl.read().collect()}
    assert got == {0: 0, 1: 111, 2: 20, 4: 40, 50: 500}
    # pre-merge snapshot untouched (time travel)
    assert _keys(tbl, as_of=s0) == [0, 1, 2, 3, 4]
    assert tbl.history()[-1]["op"] == "merge"


def test_merge_version_compaction(spark, tmp_path):
    tbl = SnapshotTable(spark, str(tmp_path / "t"))
    tbl.overwrite(_df(spark, 0, 3))
    # a compacted CDC batch: key 1 updated twice then deleted; the
    # highest version (the delete) must win; key 2's highest is an update
    tbl.merge(_ch(spark, [
        (1, 100, "U", 1), (1, 101, "U", 2), (1, None, "D", 3),
        (2, 222, "U", 2), (2, 9, "U", 1),
    ]), ["k"], version_col="_v")
    got = {r["k"]: r["v"] for r in tbl.read().collect()}
    assert got == {0: 0, 2: 222}


def test_stream_merge_upsert_exactly_once_and_idempotent(spark, tmp_path):
    import pandas as pd
    from terraspark.datapipe.streamops import stream_merge_upsert
    ddl = "k bigint, v bigint, _op string, _v int"
    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(src)
    tbl = SnapshotTable(spark, str(tmp_path / "t"))
    tbl.overwrite(_df(spark, 0, 4))
    batch = pd.DataFrame({"k": [1, 2, 50],
                          "v": pd.array([111, None, 500], dtype="Int64"),
                          "_op": ["U", "D", "U"],
                          "_v": pd.array([1, 1, 1], dtype="int32")})
    batch.to_parquet(os.path.join(src, "drop-0.parquet"), index=False)
    stream_merge_upsert(spark, src, ddl, tbl, ["k"], ckpt,
                        version_col="_v")
    state = {r["k"]: r["v"] for r in tbl.read().collect()}
    assert state == {0: 0, 1: 111, 3: 30, 50: 500}
    n_commits = len(tbl.history())
    # drain again with no new files: checkpoint must prevent re-applying
    # the processed batch (no new snapshot commit)
    stream_merge_upsert(spark, src, ddl, tbl, ["k"], ckpt,
                        version_col="_v")
    assert len(tbl.history()) == n_commits
    # crash-replay convergence: re-merging the SAME batch directly is a
    # no-op on table content (deletes of absent keys no-op, re-upserts
    # replace identical rows)
    tbl.merge(spark.createDataFrame(batch, ddl), ["k"], version_col="_v")
    assert {r["k"]: r["v"] for r in tbl.read().collect()} == state


def test_concurrent_commit_is_conditional(spark, tmp_path):
    """A second writer computing the same snap id must fail loudly, not
    silently clobber the first manifest (put-if-absent via os.link)."""
    from terraspark.snapshots import ConcurrentCommitError
    tbl = SnapshotTable(spark, str(tmp_path / "t"))
    tbl.overwrite(_df(spark, 0, 3))
    winner = {"snap_id": 1, "parent": 0, "op": "append",
              "visible": [0, 1], "rows": 2, "ts": 0.0}
    tbl._commit(winner)                      # writer A claims sid 1
    with pytest.raises(ConcurrentCommitError):
        tbl._commit({**winner, "rows": 99})  # writer B loses, loudly
    assert tbl._manifest(1)["rows"] == 2     # A's manifest intact


def test_manifest_rows_counted_from_written_data(spark, tmp_path):
    """The manifest row count must reflect what landed on disk, not a
    second execution of the caller's (possibly nondeterministic) plan."""
    tbl = SnapshotTable(spark, str(tmp_path / "t"))
    sid = tbl.overwrite(_df(spark, 0, 7))
    assert tbl._manifest(sid)["rows"] == 7
    assert tbl.read().count() == 7


def test_rollback_empty_table_raises(spark, tmp_path):
    tbl = SnapshotTable(spark, str(tmp_path / "t"))
    with pytest.raises(NoSuchSnapshotError):
        tbl.rollback(0)
