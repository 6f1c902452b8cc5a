"""Structured Streaming ingest: incremental correction == batch engine,
exactly-once across re-invocations, native streaming aggregation.
"""
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from terraspark import streaming
from terraspark.fixtures import (DEM_SCHEMA, SCENES_SCHEMA, build_tables,
                                 to_spark)


@pytest.fixture(scope="module")
def stream_env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    images, scenes, dem, aoi, _ = build_tables(8)
    src = os.path.join(root, "images_in")
    os.makedirs(src)
    # first drop: 4 images in two files (two input splits for the source)
    images.iloc[:2].to_parquet(os.path.join(src, "part-0.parquet"),
                               index=False)
    images.iloc[2:4].to_parquet(os.path.join(src, "part-1.parquet"),
                                index=False)
    return {
        "root": str(root), "src": src, "images": images,
        "scenes_df": to_spark(spark, scenes, SCENES_SCHEMA),
        "dem_df": to_spark(spark, dem, DEM_SCHEMA),
    }


def _summaries(spark, out_dir):
    from terraspark.config import TILE
    df = spark.read.parquet(out_dir)

    def summarize(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            px = np.frombuffer(b"".join(pdf["px"].tolist()),
                               dtype="<f4").reshape(len(pdf), TILE * TILE)
            fin = np.isfinite(px)
            yield pd.DataFrame({
                "image_id": pdf["image_id"], "band": pdf["band"],
                "method": pdf["method"],
                "n_valid": fin.sum(axis=1).astype("int64"),
                "s": np.where(fin, px.astype(np.float64), 0.0).sum(axis=1)})

    return (df.mapInPandas(summarize, schema="image_id string, band int, "
                           "method string, n_valid long, s double")
            .groupBy("image_id", "band", "method")
            .agg(F.sum("n_valid").alias("n_valid"),
                 F.round(F.sum("s"), 3).alias("s"))
            .toPandas().sort_values(["image_id", "band", "method"])
            .reset_index(drop=True))


def test_stream_matches_batch_and_resumes(spark, stream_env):
    env = stream_env
    out = os.path.join(env["root"], "out")
    ckpt = os.path.join(env["root"], "ckpt")

    streaming.stream_correct(spark, env["src"], env["scenes_df"],
                             env["dem_df"], out, ckpt,
                             methods=("cosine_t", "scs"))
    first = spark.read.parquet(out)
    ids1 = {r["image_id"] for r in
            first.select("image_id").distinct().collect()}
    assert ids1 == {f"img_{i:06d}" for i in range(4)}

    # second drop: 4 more images; SAME checkpoint -> only new files run
    env["images"].iloc[4:].to_parquet(
        os.path.join(env["src"], "part-2.parquet"), index=False)
    streaming.stream_correct(spark, env["src"], env["scenes_df"],
                             env["dem_df"], out, ckpt,
                             methods=("cosine_t", "scs"))
    all_rows = spark.read.parquet(out)
    per_img = all_rows.groupBy("image_id").count().toPandas()
    assert len(per_img) == 8
    # no duplicates: every image has exactly 4 bands x 16 tiles x 2 methods
    assert (per_img["count"] == 4 * 16 * 2).all()
    # images 0-3 were NOT re-processed (their batch_id predates the resume)
    bmax = all_rows.groupBy("image_id").agg(
        F.max("batch_id").alias("b")).toPandas()
    b0 = bmax[bmax["image_id"] < "img_000004"]["b"].max()
    b1 = bmax[bmax["image_id"] >= "img_000004"]["b"].min()
    assert b1 > b0

    # incremental result == one-shot batch engine over all 8 images
    from terraspark.pipeline import TopoEngine
    from terraspark.fixtures import IMAGES_SCHEMA
    eng = TopoEngine(spark)
    images_df = to_spark(spark, env["images"], IMAGES_SCHEMA)
    batch_out = os.path.join(env["root"], "batch_out")
    eng.correct(images_df, env["scenes_df"], env["dem_df"],
                methods=("cosine_t", "scs")).write.parquet(batch_out)
    eng.unpersist()
    a, b = _summaries(spark, out), _summaries(spark, batch_out)
    pd.testing.assert_frame_equal(a, b)


def test_streaming_aggregation(spark, stream_env):
    env = stream_env
    ckpt = os.path.join(env["root"], "ckpt_agg")
    streaming.cell_tile_counts(spark, env["src"], env["scenes_df"], ckpt,
                               query_name="t_cell_counts")
    got = spark.sql("SELECT * FROM t_cell_counts").toPandas()
    # 8 images x 4 bands x 16 tiles = 512 tile rows across all cells
    assert got["n_tiles"].sum() == 8 * 4 * 16
    assert (got["n_tiles"] > 0).all()


def test_batch_write_idempotent(spark, stream_env, tmp_path):
    """A foreachBatch replay (crash between parquet commit and checkpoint
    commit) re-runs write_batch with the SAME batch_id: the dynamic
    partition overwrite must rewrite, not duplicate."""
    env = stream_env
    out = str(tmp_path / "idem_out")
    from terraspark.pipeline import TopoEngine
    from terraspark.fixtures import IMAGES_SCHEMA
    eng = TopoEngine(spark)
    images_df = to_spark(spark, env["images"].iloc[:2], IMAGES_SCHEMA)
    corrected = eng.correct(images_df, env["scenes_df"], env["dem_df"],
                            methods=("cosine_t",))
    streaming.write_batch(corrected, 0, out)
    n1 = spark.read.parquet(out).count()
    streaming.write_batch(corrected, 0, out)       # replay of batch 0
    assert spark.read.parquet(out).count() == n1   # no duplicates
    streaming.write_batch(corrected, 1, out)       # a NEW batch appends
    assert spark.read.parquet(out).count() == 2 * n1
    eng.unpersist()


def test_stream_regression_method_parity(spark, stream_env, tmp_path):
    """Regression-based methods are streaming-safe: scalars aggregate per
    (image, band) and image rows never span micro-batches, so streamed
    scalars == batch scalars exactly (module docstring contract)."""
    env = stream_env
    out, ckpt = str(tmp_path / "reg_out"), str(tmp_path / "reg_ckpt")
    streaming.stream_correct(spark, env["src"], env["scenes_df"],
                             env["dem_df"], out, ckpt,
                             methods=("veca", "c_correction"))
    # batch engine over the SAME files currently in src
    from terraspark.pipeline import TopoEngine
    eng = TopoEngine(spark)
    batch_out = str(tmp_path / "reg_batch")
    eng.correct(spark.read.schema(streaming.IMAGES_DDL).parquet(env["src"]),
                env["scenes_df"], env["dem_df"],
                methods=("veca", "c_correction")).write.parquet(batch_out)
    eng.unpersist()
    a, b = _summaries(spark, out), _summaries(spark, batch_out)
    pd.testing.assert_frame_equal(a, b)


def test_stream_exact_dedup_stateful(spark, tmp_path):
    """applyInPandasWithState dedup: state carries seen fingerprints
    across checkpointed availableNow runs -- duplicates landing in a
    LATER drop are flagged, and the verdicts equal the batch first-wins
    window rule."""
    from terraspark.datapipe import streamops

    docs = pd.DataFrame({
        "doc_id": list(range(8)),
        "text": [f"unique document {i}" for i in range(4)]
        + ["dup  text a", "dup text a",        # same after normalization
           "another", "another"],
    })
    src = tmp_path / "in"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    docs.iloc[:5].to_parquet(src / "drop-0.parquet", index=False)
    streamops.stream_exact_dedup(spark, str(src), out, ckpt)
    n_first = spark.read.parquet(out).count()
    assert n_first == 5
    # drop 2: one cross-drop dup (of doc 4) + the in-batch dup pair (6, 7)
    docs.iloc[5:].to_parquet(src / "drop-1.parquet", index=False)
    streamops.stream_exact_dedup(spark, str(src), out, ckpt)
    got = spark.read.parquet(out).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 8                      # resume processed only the delta
    exp = streamops.batch_first_wins(
        spark.createDataFrame(docs)).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # the interesting rows: 5 is a cross-batch dup, 7 an in-batch dup
    verdicts = got.set_index("doc_id")["is_first"]
    assert not verdicts[5] and not verdicts[7] and verdicts[6]


def test_stream_windowed_counts_watermark(spark, tmp_path):
    """Watermarked tumbling-window aggregation: two time-ordered drops +
    sentinel flush must emit every real window exactly once, and a
    planted too-late event must be DROPPED (its window was finalized
    before it arrived)."""
    from terraspark.datapipe import streamops

    def ev(eid, ts, typ, val):
        return {"event_id": eid, "ts": pd.Timestamp(ts), "user_id": 1,
                "event_type": typ, "value": float(val)}

    drop0 = pd.DataFrame([
        ev(1, "2024-01-01 01:00", "a", 10),
        ev(2, "2024-01-01 02:00", "a", 5),
        ev(3, "2024-01-02 03:00", "b", 7),
        ev(4, "2024-01-05 12:00", "a", 1),   # advances the watermark
    ])
    late = ev(9, "2024-01-01 06:00", "a", 1000)   # window long finalized
    drop1 = pd.DataFrame([
        ev(5, "2024-01-06 01:00", "b", 2),
        late,
    ])

    def write(df, name):
        df.assign(ts=df["ts"].astype("datetime64[us]")).to_parquet(
            str(tmp_path / "in" / name), index=False)

    (tmp_path / "in").mkdir()
    src, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), \
        str(tmp_path / "ckpt")
    write(drop0, "d0.parquet")
    streamops.stream_windowed_counts(spark, src, out, ckpt)
    write(drop1, "d1.parquet")
    streamops.stream_windowed_counts(spark, src, out, ckpt)
    write(pd.DataFrame([ev(90, "2024-02-01", "__s__", 0)]), "d2.parquet")
    write(pd.DataFrame([ev(91, "2024-03-01", "__s__", 0)]), "d3.parquet")
    streamops.stream_windowed_counts(spark, src, out, ckpt,
                                     max_files_per_trigger=1)

    got = (spark.read.parquet(out)
           .where(F.col("event_type") != "__s__").toPandas()
           .sort_values(["window_start", "event_type"])
           .reset_index(drop=True))
    day = 86400
    base = int(pd.Timestamp("2024-01-01").timestamp())
    want = pd.DataFrame({
        "window_start": [base, base + day, base + 4 * day, base + 5 * day],
        "event_type": ["a", "b", "a", "b"],
        "n": [2, 1, 1, 1],
        "sum_value": [15.0, 7.0, 1.0, 2.0],
    })
    assert got["window_start"].tolist() == want["window_start"].tolist()
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["n"].tolist() == want["n"].tolist()        # late row absent
    assert got["sum_value"].tolist() == want["sum_value"].tolist()
    # exactly-once: no (window, type) appears twice
    assert not got.duplicated(["window_start", "event_type"]).any()


def test_stream_static_join_exactly_once(spark, tmp_path):
    """Two drops + one checkpoint: second drain processes only the delta;
    the union equals the batch join exactly (no dup, no loss)."""
    import os
    import pandas as pd
    from pyspark.sql import functions as F
    from terraspark.datapipe import streamops

    docs = pd.DataFrame({
        "doc_id": range(40),
        "text": [f"w{i} w{i + 1} w{i + 2}" for i in range(40)],
        "lang": ["en", "de"] * 20})
    dim = spark.createDataFrame([("en", 1.0), ("de", 2.0)],
                                "lang string, weight double")
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(src)
    docs[docs["doc_id"] < 25].to_parquet(os.path.join(src, "d0.parquet"),
                                         index=False)
    streamops.stream_static_join(spark, src, dim, out, ckpt)
    first = spark.read.parquet(out).toPandas()
    assert sorted(first["doc_id"]) == list(range(25))
    docs[docs["doc_id"] >= 25].to_parquet(os.path.join(src, "d1.parquet"),
                                          index=False)
    streamops.stream_static_join(spark, src, dim, out, ckpt)
    got = spark.read.parquet(out).toPandas().sort_values("doc_id")
    assert sorted(got["doc_id"]) == list(range(40))   # once each
    # weights applied: every doc has 3 tokens
    want = {"en": 3.0, "de": 6.0}
    assert all(got["weighted_tokens"].to_numpy()
               == [want[lg] for lg in got["lang"]])


def test_stream_exact_dedup_rocksdb_state_store(spark, tmp_path):
    """The scale path the docstring promises: the SAME stateful dedup
    runs with the RocksDB state store provider (state spills to local
    disk instead of living on the JVM heap) and produces identical
    verdicts, including cross-batch duplicate detection across a
    checkpointed resume."""
    from terraspark.datapipe import streamops

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    rocks = ("org.apache.spark.sql.execution.streaming."
             "state.RocksDBStateStoreProvider")
    docs = pd.DataFrame({
        "doc_id": list(range(6)),
        "text": ["a", "b", "c", "a", "d", "B"],   # 3 & 5 are dups (case-normalized)
    })
    src = tmp_path / "in"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spark.conf.set(key, rocks)
    try:
        docs.iloc[:3].to_parquet(src / "drop-0.parquet", index=False)
        streamops.stream_exact_dedup(spark, str(src), out, ckpt)
        docs.iloc[3:].to_parquet(src / "drop-1.parquet", index=False)
        streamops.stream_exact_dedup(spark, str(src), out, ckpt)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    got = spark.read.parquet(out).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 6
    verdicts = got.set_index("doc_id")["is_first"]
    assert verdicts[0] and verdicts[1] and verdicts[2] and verdicts[4]
    assert not verdicts[3] and not verdicts[5]
    # the checkpoint actually carried RocksDB state files
    import pathlib
    state_files = list(pathlib.Path(ckpt).rglob("*.zip")) + \
        list(pathlib.Path(ckpt).rglob("*.changelog")) + \
        list(pathlib.Path(ckpt).rglob("*.snapshot"))
    assert state_files, "no RocksDB state artifacts under the checkpoint"


def test_stream_cell_rollup_matches_batch(spark, stream_env, tmp_path):
    """Two-drop streaming continuous aggregate == batch cell partials,
    row for row (merge of per-batch partials is exact)."""
    from terraspark import sinks, streaming as tstreaming
    from terraspark.pipeline import TopoEngine
    from terraspark import corrections
    from terraspark.config import METHODS
    from terraspark.fixtures import IMAGES_SCHEMA

    out = str(tmp_path / "ru_out")
    ckpt = str(tmp_path / "ru_ckpt")
    src = str(tmp_path / "ru_src")
    os.makedirs(src)
    images = stream_env["images"]
    images.iloc[:3].to_parquet(os.path.join(src, "d0.parquet"), index=False)
    tstreaming.stream_cell_rollup(spark, src, stream_env["scenes_df"],
                                  stream_env["dem_df"], out, ckpt)
    images.iloc[3:].to_parquet(os.path.join(src, "d1.parquet"), index=False)
    tstreaming.stream_cell_rollup(spark, src, stream_env["scenes_df"],
                                  stream_env["dem_df"], out, ckpt)
    streamed = {(r["cell"], r["band"]): r
                for r in tstreaming.merged_cell_rollup(spark, out).collect()}

    eng = TopoEngine(spark)
    images_df = to_spark(spark, images, IMAGES_SCHEMA)
    joined = eng.joined(images_df, stream_env["scenes_df"],
                        stream_env["dem_df"])
    sc = corrections.band_stats_df(joined, eng.params, eng.tile)
    corrected = corrections.apply_corrections(
        joined, sc, ("cosine_t",), eng.params, eng.tile)
    base = sinks.cell_partials(corrected).drop("method")
    from terraspark.streaming import merged_cell_rollup  # finalize inline
    from pyspark.sql import functions as F
    mean = F.col("s") / F.col("n")
    var = F.col("ss") / F.col("n") - mean * mean
    batch = {(r["cell"], r["band"]): r for r in base.select(
        "cell", "band", F.col("n").cast("long").alias("n"),
        F.round(mean, 4).alias("mean"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 4).alias("std"),
        F.round("vmin", 4).alias("vmin"),
        F.round("vmax", 4).alias("vmax")).collect()}

    assert set(streamed) == set(batch)
    for key, s in streamed.items():
        b = batch[key]
        assert s["n"] == b["n"]
        for c in ("mean", "std", "vmin", "vmax"):
            assert s[c] == b[c], (key, c)


def test_stream_stream_join_cross_drop_and_exactly_once(spark, tmp_path):
    from terraspark.datapipe import streamops
    src = tmp_path / "ssj_in"
    src.mkdir()
    out, ckpt = str(tmp_path / "ssj_out"), str(tmp_path / "ssj_ckpt")

    def ev(eid, ts, uid, typ):
        return {"event_id": eid, "ts": pd.Timestamp(ts), "user_id": uid,
                "event_type": typ, "value": 1.0}

    def write(rows, name):
        df = pd.DataFrame(rows)
        df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        df.to_parquet(str(src / name), index=False)

    # drop 0: a view; drop 1 (30 min later): the matching purchase --
    # the view lives in join state across the batch boundary
    write([ev(1, "2024-01-01 10:00:00", 7, "view"),
           ev(2, "2024-01-01 10:10:00", 8, "view")], "drop-0.parquet")
    streamops.stream_stream_join(spark, str(src), out, ckpt)
    write([ev(3, "2024-01-01 10:30:00", 7, "purchase"),
           ev(4, "2024-01-01 12:00:00", 8, "purchase")], "drop-1.parquet")
    streamops.stream_stream_join(spark, str(src), out, ckpt)
    got = {(r["user_id"], r["view_id"], r["buy_id"], r["gap_sec"])
           for r in spark.read.parquet(out).collect()}
    # user 7 joins (30 min gap); user 8's purchase is 110 min after the
    # view -- outside the 1 h interval, never emitted
    assert got == {(7, 1, 3, 1800)}
    # re-invoking with no new files appends nothing (exactly-once)
    streamops.stream_stream_join(spark, str(src), out, ckpt)
    assert spark.read.parquet(out).count() == 1


def test_stream_sessions_cross_batch_stitch(spark, tmp_path):
    """A session spanning the drop boundary must be stitched via keyed
    state (not closed at the batch edge), closed sessions emit exactly
    once, and the final open session never emits."""
    import pandas as pd
    from terraspark.datapipe.streamops import (SESSION_GAP_US,
                                               stream_sessions)
    m = 60 * 1_000_000
    base = pd.Timestamp("2026-01-05 10:00:00")

    def ev(eid, uid, offset_min):
        return (eid, base + pd.Timedelta(minutes=offset_min), uid,
                "view", 1.0)

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    # user 1: session A = [0, 10]; 40-min gap; session B spans the drop
    #         boundary: [50 (drop 0)] + [60, 65 (drop 1)]; gap; [120]
    # user 2: single session [0, 5] only -> never emits
    drop0 = pd.DataFrame([ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 50),
                          ev(4, 2, 0), ev(5, 2, 5)], columns=cols)
    drop1 = pd.DataFrame([ev(6, 1, 60), ev(7, 1, 65), ev(8, 1, 120)],
                         columns=cols)
    src = tmp_path / "in"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    drop0 = drop0.assign(ts=drop0["ts"].astype("datetime64[us]"))
    drop1 = drop1.assign(ts=drop1["ts"].astype("datetime64[us]"))
    drop0.to_parquet(src / "drop-0.parquet", index=False)
    stream_sessions(spark, str(src), out, ckpt)
    first = spark.read.parquet(out).collect()
    # only session A closed by drop 0 (the 40-min gap before t=50)
    assert [(r["user_id"], r["session_idx"], r["n_events"])
            for r in first] == [(1, 0, 2)]
    drop1.to_parquet(src / "drop-1.parquet", index=False)
    stream_sessions(spark, str(src), out, ckpt)
    rows = {(r["user_id"], r["session_idx"]):
            (r["n_events"], r["start_us"], r["end_us"])
            for r in spark.read.parquet(out).collect()}
    t0 = int(base.value // 1000)
    # session B = events at 50, 60, 65 min -- STITCHED across the drops
    assert rows[(1, 1)] == (3, t0 + 50 * m, t0 + 65 * m)
    # session A emitted exactly once; user 1's [120] and user 2's
    # session remain open in state
    assert set(rows) == {(1, 0), (1, 1)}
    assert rows[(1, 0)] == (2, t0, t0 + 10 * m)
    assert SESSION_GAP_US == 30 * m
