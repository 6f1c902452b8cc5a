"""Checkpoint-resumable stages with per-partition lineage + metrics.

North-rule addition (the reference's closest analogue is per-band
cancellation checkpoints and wall-time logs,
/root/reference/processing_alg/topocorrection/TopoCorrectionAlgorithm.py:62-68,83-86):
every pipeline stage is an idempotent partitioned parquet write plus a
manifest.  Layout per (run_root, stage):

    {root}/{stage}/data/part_id=K/...      -- stage output, bucketed
    {root}/{stage}/_manifest/K.json        -- committed AFTER the bucket's
                                              data: partition lineage row
                                              {part_id, rows, wall_ms, ts}

Resume = anti-join the input's bucket ids against committed manifest
entries and process only the missing buckets; writes use dynamic partition
overwrite so a re-run of a crashed bucket replaces (never duplicates) its
data.  Byte-identical output and no duplicate partitions are asserted in
tests/test_lineage.py.

At cluster scale the manifest directory would live on the object store /
Iceberg snapshot metadata; the mechanism (bucket-granular commit + anti-join
resume) is unchanged.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageRunner:
    def __init__(self, spark: SparkSession, root: str, buckets: int = 16):
        self.spark = spark
        self.root = root
        self.buckets = buckets
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # ------------------------------------------------------------ paths
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_dir(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "_manifest")

    def _data_dir(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "data")

    # --------------------------------------------------------- manifest
    def completed_buckets(self, stage: str) -> set[int]:
        d = self._manifest_dir(stage)
        if not os.path.isdir(d):
            return set()
        return {int(f[:-5]) for f in os.listdir(d) if f.endswith(".json")}

    def manifest(self, stage: str) -> list[dict]:
        d = self._manifest_dir(stage)
        out = []
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                if f.endswith(".json"):
                    with open(os.path.join(d, f)) as fh:
                        out.append(json.load(fh))
        return out

    def _commit(self, stage: str, part_id: int, rows: int, wall_ms: float):
        d = self._manifest_dir(stage)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{part_id}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"stage": stage, "part_id": part_id, "rows": rows,
                       "wall_ms": round(wall_ms, 1),
                       "ts": time.time()}, fh)
        os.replace(tmp, os.path.join(d, f"{part_id}.json"))  # atomic commit

    # -------------------------------------------------------------- run
    def run_stage(self, stage: str, inp: DataFrame,
                  fn: Callable[[DataFrame], DataFrame],
                  key_cols: list[str]) -> DataFrame:
        """Execute ``fn`` over the not-yet-committed buckets of ``inp``.

        Buckets are ``xxhash64(key_cols) mod buckets`` computed on the
        INPUT, so a resumed run selects exactly the unprocessed input
        slices (anti-join on the manifest).  Returns the full stage output
        (committed + newly computed) as a DataFrame.
        """
        part = F.pmod(F.xxhash64(*key_cols), F.lit(self.buckets)).cast("int")
        inp = inp.withColumn("part_id", part)
        done = self.completed_buckets(stage)
        todo_ids = sorted(set(range(self.buckets)) - done)
        for pid in todo_ids:
            t0 = time.time()
            slice_in = inp.where(F.col("part_id") == pid)
            out = fn(slice_in.drop("part_id")) \
                .withColumn("part_id", F.lit(pid))
            out.write.partitionBy("part_id").mode("overwrite") \
               .parquet(self._data_dir(stage))
            rows = self.spark.read.parquet(self._data_dir(stage)) \
                .where(F.col("part_id") == pid).count()
            self._commit(stage, pid, rows, (time.time() - t0) * 1000)
        return self.spark.read.parquet(self._data_dir(stage)) \
            .drop("part_id")

    def run_stage_batched(self, stage: str, inp: DataFrame,
                          fn: Callable[[DataFrame], DataFrame],
                          key_cols: list[str]) -> DataFrame:
        """Like run_stage but processes ALL missing buckets in one Spark job
        (bucket-granular resume, job-granular execution -- the fast path;
        per-bucket lineage rows are still committed individually)."""
        part = F.pmod(F.xxhash64(*key_cols), F.lit(self.buckets)).cast("int")
        inp = inp.withColumn("part_id", part)
        done = self.completed_buckets(stage)
        todo_ids = sorted(set(range(self.buckets)) - done)
        if todo_ids:
            t0 = time.time()
            slice_in = inp.where(F.col("part_id").isin(todo_ids))
            keyed = slice_in.drop("part_id")
            out = fn(keyed).withColumn(
                "part_id", F.pmod(F.xxhash64(*key_cols),
                                  F.lit(self.buckets)).cast("int"))
            out.write.partitionBy("part_id").mode("overwrite") \
               .parquet(self._data_dir(stage))
            wall = (time.time() - t0) * 1000
            counts = {r["part_id"]: r["n"] for r in
                      self.spark.read.parquet(self._data_dir(stage))
                      .groupBy("part_id").agg(F.count("*").alias("n"))
                      .collect()}
            for pid in todo_ids:
                self._commit(stage, pid, counts.get(pid, 0),
                             wall / max(1, len(todo_ids)))
        return self.spark.read.parquet(self._data_dir(stage)) \
            .drop("part_id")
