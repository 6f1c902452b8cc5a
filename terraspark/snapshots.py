"""Iceberg-style snapshot table: atomic commits, snapshot-isolated
reads, time travel and metadata-only rollback over plain parquet.

The north rule frames the engine's outputs as Iceberg tables; the
container has no Iceberg runtime, so this module implements the part of
the Iceberg metadata model the pipeline actually relies on, on plain
files (same class of substitute as cells.py standing in for the h3
package):

    {root}/data/snap_id=N/...        immutable data files of commit N
    {root}/_snapshots/N.json         manifest: {snap_id, parent, op,
                                     visible: [snap ids], rows, ts}

* COMMIT is a single atomic ``os.replace`` of the manifest file, AFTER
  the data lands -- a crash between the two leaves an orphan data
  directory, never a half-visible commit (readers only trust
  manifests).
* A manifest carries the full ``visible`` list (the partition ids that
  make up the table at that snapshot), so READ is: resolve ONE
  manifest, then scan exactly those immutable partitions -- readers are
  snapshot-isolated from concurrent appends by construction.
* ``append`` extends the parent's visible list; ``overwrite`` replaces
  it; ``rollback`` writes a NEW snapshot whose visible list is copied
  from an older one -- O(metadata), no data moved, history preserved
  (exactly Iceberg's rollback semantics).
* ``read(as_of=k)`` time-travels to any committed snapshot.

At cluster scale the manifest directory lives on the object store and
the atomic rename becomes a conditional PUT / catalog swap; the reader
and writer logic is unchanged.  Partition data is written by Spark
(``snap_id`` is a real partition column), so scans prune to the visible
set via a pushed-down ``snap_id IN (...)`` filter.
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class NoSuchSnapshotError(KeyError):
    pass


class ConcurrentCommitError(RuntimeError):
    """Another writer claimed this snap id first (manifest already
    exists).  The losing writer's data partition may have been written;
    its manifest was NOT committed, so the table state is untouched --
    retry the whole operation to re-read the current snapshot."""


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(self._meta_dir(), exist_ok=True)

    def _meta_dir(self) -> str:
        return os.path.join(self.root, "_snapshots")

    def _data_dir(self) -> str:
        return os.path.join(self.root, "data")

    # --------------------------------------------------------- metadata
    def history(self) -> list[dict]:
        out = []
        for f in os.listdir(self._meta_dir()):
            if f.endswith(".json"):
                with open(os.path.join(self._meta_dir(), f)) as fh:
                    out.append(json.load(fh))
        return sorted(out, key=lambda m: m["snap_id"])

    def current_snapshot(self) -> int | None:
        h = self.history()
        return h[-1]["snap_id"] if h else None

    def _manifest(self, snap_id: int) -> dict:
        p = os.path.join(self._meta_dir(), f"{snap_id}.json")
        if not os.path.exists(p):
            raise NoSuchSnapshotError(snap_id)
        with open(p) as fh:
            return json.load(fh)

    def _commit(self, manifest: dict) -> int:
        """Conditional (compare-and-swap) manifest publish: the snap id
        was allocated by a non-atomic read(current)+1, so publishing via
        ``os.replace`` would let a second concurrent writer silently
        clobber the first.  ``os.link`` fails with EEXIST if ``sid.json``
        is already claimed -- the exact put-if-absent primitive Iceberg
        requires of its catalog -- turning the race into a loud
        :class:`ConcurrentCommitError` the caller can retry."""
        sid = manifest["snap_id"]
        tmp = os.path.join(self._meta_dir(), f".{sid}.json.tmp.{os.getpid()}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            os.link(tmp, os.path.join(self._meta_dir(), f"{sid}.json"))
        except FileExistsError:
            raise ConcurrentCommitError(
                f"snapshot {sid} was committed by another writer") from None
        finally:
            os.unlink(tmp)
        return sid

    # ------------------------------------------------------------ write
    def _write(self, df: DataFrame, op: str, visible_fn) -> int:
        import time
        cur = self.current_snapshot()
        sid = 0 if cur is None else cur + 1
        (df.withColumn("snap_id", F.lit(sid))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("snap_id").parquet(self._data_dir()))
        # Count the WRITTEN files, not the input plan: executing the
        # caller's plan twice (count then write) would record a wrong
        # manifest row count for any nondeterministic plan, and re-runs
        # the full upstream computation besides.
        rows = (self.spark.read.parquet(self._data_dir())
                .where(F.col("snap_id") == sid).count())
        parent_visible = [] if cur is None \
            else self._manifest(cur)["visible"]
        return self._commit({
            "snap_id": sid, "parent": cur, "op": op,
            "visible": visible_fn(parent_visible, sid),
            "rows": rows, "ts": time.time()})

    def append(self, df: DataFrame) -> int:
        """New snapshot = parent's partitions + this one."""
        return self._write(df, "append", lambda vis, sid: vis + [sid])

    def overwrite(self, df: DataFrame) -> int:
        """New snapshot replaces the whole visible set."""
        return self._write(df, "overwrite", lambda vis, sid: [sid])

    def merge(self, changes: DataFrame, key_cols, op_col: str = "_op",
              version_col: str | None = None) -> int:
        """MERGE (CDC apply): a change row with op ``'D'`` deletes its
        key; every other row upserts (replace-or-insert).  When
        ``version_col`` is given, only the highest-version change per
        key applies (CDC log compaction -- the shape a Debezium/binlog
        batch arrives in); otherwise change keys must be unique.

        Copy-on-write at visible-set granularity: the new snapshot is
        ONE rewritten partition (base anti-join change-keys, union
        surviving upserts), committed with the same atomic manifest
        flow as append/overwrite -- so a crash mid-merge leaves the
        parent snapshot intact and readable.  A production Iceberg
        MERGE rewrites only the files that contain touched keys; the
        commit/visibility model is identical, the rewrite granularity
        here is the whole table because fixture snapshots are single
        partitions.  The anti-join broadcasts the (small) change-key
        set against the base scan, so the rewrite is one pass over the
        base with no shuffle of the base side.
        """
        key_cols = list(key_cols)
        ch = changes
        if version_col is not None:
            from pyspark.sql import Window
            w = Window.partitionBy(*key_cols) \
                .orderBy(F.col(version_col).desc())
            ch = (ch.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") == 1).drop("_rn", version_col))
        base = self.read()
        keys = ch.select(*key_cols).distinct()
        kept = base.join(F.broadcast(keys), key_cols, "left_anti")
        ups = ch.where(F.col(op_col) != "D").drop(op_col)
        # materialize once: _write both counts and writes its input, and
        # this plan contains the full base scan + anti-join -- without a
        # checkpoint every CDC batch would scan the base table twice
        merged = kept.unionByName(ups).localCheckpoint()
        return self._write(merged, "merge", lambda vis, sid: [sid])

    def rollback(self, to_snap: int) -> int:
        """Metadata-only: a NEW snapshot whose visible set is copied
        from ``to_snap``; no data is moved or deleted and the rolled-
        back history stays readable via time travel."""
        import time
        target = self._manifest(to_snap)
        cur = self.current_snapshot()
        if cur is None:
            raise NoSuchSnapshotError(
                f"cannot rollback empty table to snapshot {to_snap}")
        sid = cur + 1
        return self._commit({
            "snap_id": sid, "parent": cur, "op": f"rollback[{to_snap}]",
            "visible": list(target["visible"]),
            "rows": 0, "ts": time.time()})

    # ------------------------------------------------------------- read
    def read(self, as_of: int | None = None) -> DataFrame:
        """Snapshot-isolated scan: resolve ONE manifest, then read
        exactly its immutable partitions (``snap_id IN (...)`` prunes
        at the source)."""
        sid = self.current_snapshot() if as_of is None else as_of
        if sid is None:
            raise NoSuchSnapshotError("empty table")
        vis = self._manifest(sid)["visible"]
        df = self.spark.read.parquet(self._data_dir())
        if not vis:
            return df.where(F.lit(False)).drop("snap_id")
        return df.where(F.col("snap_id").isin(vis)).drop("snap_id")
