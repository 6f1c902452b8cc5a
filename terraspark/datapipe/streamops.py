"""Streaming training-data operators: stateful exact-dedup over a
document stream (``applyInPandasWithState``).

At ingest time a 10^12-document corpus arrives continuously; re-running
batch dedup over the whole corpus per drop is O(corpus).  This operator
keeps the seen-fingerprint set as SPARK STREAMING STATE keyed by
fingerprint: each micro-batch only touches the fingerprints it contains,
and the checkpoint makes the state crash-durable -- the canonical
``applyInPandasWithState`` shape for custom stateful logic that the
built-in streaming aggregations can't express (we need a per-key
first-wins verdict emitted per ROW, not an aggregate).

Determinism contract (what the oracle relies on): when drops are
monotone in ``doc_id`` (drop N's ids all precede drop N+1's), a
document is ``is_first`` iff its doc_id is the global minimum of its
fingerprint group -- within a batch the min doc_id of an unseen
fingerprint wins, across batches the state wins.  This is exactly
``doc_id = MIN(doc_id) OVER (PARTITION BY fp)`` in SQL, which is the
dp_stream_dedup oracle.

Scale notes: state is one row (fp, min_id) per distinct fingerprint --
at corpus scale back the state store with RocksDB
(``spark.sql.streaming.stateStore.providerClass``) and drop fingerprint
prefixes into separate queries if a single store's keyspace becomes the
bottleneck; the per-batch work stays proportional to the batch.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_DDL = "doc_id long, text string"
OUT_SCHEMA = "doc_id long, fp string, is_first boolean"
STATE_SCHEMA = "seen_min long"


def _fp_col():
    """Fingerprint expression -- IDENTICAL to textstats.fingerprint (md5
    of whitespace-normalized lowercased text)."""
    return F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))


def _dedup_fn(key, pdfs, state: GroupState):
    """Per-fingerprint group handler: first-ever doc (min doc_id of the
    first batch that carries this fp) is is_first; everything later --
    same batch or any later batch -- is a duplicate."""
    seen_min = state.get[0] if state.exists else None
    ids: list[int] = []
    for pdf in pdfs:
        ids.extend(int(i) for i in pdf["doc_id"])
    if not ids:
        return
    bmin = min(ids)
    yield pd.DataFrame({
        "doc_id": ids,
        "fp": [key[0]] * len(ids),
        "is_first": [seen_min is None and i == bmin for i in ids],
    })
    state.update((bmin if seen_min is None else min(seen_min, bmin),))


def stream_exact_dedup(spark: SparkSession, docs_dir: str, out_dir: str,
                       checkpoint_dir: str) -> None:
    """Drain all unseen document files (availableNow) and append each
    row's dedup verdict to ``out_dir``; re-invoking after new files land
    processes only the delta, with the seen-fingerprint state carried in
    the checkpoint."""
    stream = (spark.readStream.schema(DOCS_DDL).parquet(docs_dir)
              .withColumn("fp", _fp_col()))
    verdicts = stream.groupBy("fp").applyInPandasWithState(
        _dedup_fn, OUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)
    q = (verdicts.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def batch_first_wins(docs: DataFrame) -> DataFrame:
    """Batch reference for the streaming verdicts: is_first iff doc_id is
    the minimum of its fingerprint group (the oracle's window rule)."""
    from pyspark.sql import Window
    f = docs.select("doc_id", _fp_col().alias("fp"))
    w = Window.partitionBy("fp")
    return f.select("doc_id", "fp",
                    (F.col("doc_id") == F.min("doc_id").over(w))
                    .alias("is_first"))


# ----------------------------------------------------------------------
# watermarked windowed aggregation (late-data handling)
# ----------------------------------------------------------------------
# ts is TIMESTAMP_NTZ on disk (pandas-written parquet); the operator
# casts it to TIMESTAMP under the session's pinned-UTC zone (see
# session.build_session), the same NTZ convention as rel_sessionize
EVENTS_DDL = ("event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double")


def stream_windowed_counts(spark: SparkSession, events_dir: str,
                           out_dir: str, checkpoint_dir: str,
                           window: str = "1 day",
                           watermark: str = "1 hour",
                           max_files_per_trigger: int | None = None) -> None:
    """Event-time tumbling-window counts with a WATERMARK -- the built-in
    streaming-aggregation path for late data: per (window, event_type)
    count + value sum, kept as Spark streaming state and emitted in
    APPEND mode exactly once, when the watermark passes the window's end.

    Late-data semantics (what the driver query asserts non-vacuously):
    an event arriving after the watermark has passed its window is
    DROPPED -- its window's state is already finalized and emitted, so a
    corpus replayed with bounded disorder produces exactly-once window
    rows, never corrections.  The watermark advances to
    max(event time seen) - ``watermark`` after each micro-batch and is
    applied during the NEXT batch (so a final far-future sentinel batch
    is the standard way to flush all real windows in a drain-and-stop
    ingest; sentinel windows themselves stay unemitted).

    Scale shape: state is one row per open (window, event_type) --
    bounded by cardinality x windows-per-watermark-horizon, independent
    of event volume; the aggregation is a standard partial+final hash
    agg per batch.  Exactly-once output comes from the file sink's
    manifest + the checkpoint (no foreachBatch needed for a pure
    streaming aggregation)."""
    reader = spark.readStream.schema(EVENTS_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (stream.withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"), "event_type")
           .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
           .select(F.unix_timestamp(F.col("w.start")).alias("window_start"),
                   "event_type", "n", "sum_value"))
    q = (agg.writeStream
         .outputMode("append")
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


# ------------------------------------------------------ stream-static join
DOCS_LANG_DDL = "doc_id long, text string, lang string"


def stream_static_join(spark: SparkSession, docs_dir: str,
                       dim: DataFrame, out_dir: str,
                       checkpoint_dir: str) -> None:
    """STREAM-STATIC broadcast join: streaming document rows enriched
    with a static dimension table (per-lang weight), appended per
    micro-batch.  The static side is broadcast and re-resolved each
    micro-batch (Spark stream-static semantics); the stream side never
    shuffles and no state is kept -- the third streaming shape next to
    applyInPandasWithState (dp_stream_dedup) and watermarked windows
    (dp_stream_window).  availableNow + checkpoint = each drop processed
    exactly once across re-invocations."""
    stream = spark.readStream.schema(DOCS_LANG_DDL).parquet(docs_dir)
    enriched = (stream
                .withColumn("n_tokens", F.size(F.split("text", " ")))
                .join(F.broadcast(dim), "lang")
                .select("doc_id", "lang", "weight",
                        (F.col("n_tokens") * F.col("weight"))
                        .alias("weighted_tokens")))
    q = (enriched.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


# ------------------------------------------------------ stream-stream join
def stream_stream_join(spark: SparkSession, events_dir: str, out_dir: str,
                       checkpoint_dir: str, interval: str = "1 hour",
                       watermark: str = "2 hours") -> None:
    """STREAM-STREAM interval join (the fourth streaming shape): view
    events joined to purchase events of the same user that happen within
    ``interval`` AFTER the view.  Both sides carry a WATERMARK and the
    join condition bounds event-time distance, so Spark can evict
    matched/expired rows from the join state -- the canonical bounded-
    state stream-stream equi+range join.

    Exactly-once: availableNow + shared checkpoint, file-sink manifest.
    State bound: each side keeps only rows newer than
    watermark + interval -- independent of total stream length.

    Determinism contract (what the oracle relies on): when the whole
    input is drained in the FIRST batch (single drop), no row is ever
    late and the result is exactly the batch interval join.  Across
    multiple time-ordered drops, rows older than the watermark at their
    arrival batch may be dropped (tested, not oracled -- same policy as
    stream_windowed_counts)."""
    ev = (spark.readStream.schema(EVENTS_DDL).parquet(events_dir)
          .withColumn("ts", F.col("ts").cast("timestamp")))
    views = (ev.where(F.col("event_type") == "view")
             .select("user_id", F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"))
             .withWatermark("view_ts", watermark))
    buys = (ev.where(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("b_user_id"),
                    F.col("event_id").alias("buy_id"),
                    F.col("ts").alias("buy_ts"))
            .withWatermark("buy_ts", watermark))
    j = views.join(
        buys,
        F.expr(f"user_id = b_user_id AND buy_ts >= view_ts "
               f"AND buy_ts <= view_ts + interval {interval}"),
        "inner").select(
            "user_id", "view_id", "buy_id",
            (F.unix_timestamp("buy_ts")
             - F.unix_timestamp("view_ts")).alias("gap_sec"))
    q = (j.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


# ------------------------------------------------- streaming CDC apply
def stream_merge_upsert(spark: SparkSession, changes_dir: str,
                        changes_ddl: str, table, key_cols,
                        checkpoint_dir: str, op_col: str = "_op",
                        version_col: str | None = None) -> None:
    """Streaming CDC apply: change batches (upsert/delete rows) arrive
    as files and each micro-batch is applied to an Iceberg-style
    snapshot table via ``foreachBatch`` -> ``SnapshotTable.merge`` --
    the lakehouse ingestion pattern (Debezium topic -> MERGE INTO).

    Exactly-once composition: the streaming checkpoint guarantees each
    batch is HANDED to foreachBatch at least once; merge itself is
    idempotent for a fixed batch (deletes of absent keys are no-ops,
    re-upserts replace identical rows), so a crash-replayed batch
    converges to the same table.  ``version_col`` compacts WITHIN a
    batch; ACROSS batches the later batch wins per key (stream order),
    which matches CDC log order when the producer emits batches in
    commit order.  Each merge is one atomic snapshot commit, so readers
    only ever see batch boundaries.
    """
    stream = spark.readStream.schema(changes_ddl).parquet(changes_dir)

    def _apply(df: DataFrame, _batch_id: int) -> None:
        if df.isEmpty():
            return
        table.merge(df, key_cols, op_col=op_col, version_col=version_col)

    q = (stream.writeStream
         .foreachBatch(_apply)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


# ----------------------------------------------------------------------
# stateful streaming sessionization (event-time gap sessions)
# ----------------------------------------------------------------------
SESS_OUT_SCHEMA = ("user_id long, session_idx int, n_events long, "
                   "start_us long, end_us long")
SESS_STATE_SCHEMA = "start_us long, last_us long, n long, closed int"
SESSION_GAP_US = 30 * 60 * 1_000_000


def _session_fn(key, pdfs, state: GroupState):
    """Per-user session assembler: fold event times (sorted within the
    batch) into the carried (open-session, closed-count) state; a gap
    > 30 min CLOSES the current session (emitted) and opens a new one.
    The open session never emits -- it may still grow in a later batch.

    In-order-drop contract (the stream_exact_dedup convention): a later
    drop must not contain events earlier than an already-processed
    drop's for the same user -- event-time sessionization over an
    out-of-order feed needs a watermark-delayed close instead, which
    stream_windowed_counts demonstrates for windowed aggregation."""
    if state.exists:
        start, last, n, closed = state.get
    else:
        start, last, n, closed = None, None, 0, 0
    ts: list[int] = []
    for pdf in pdfs:
        ts.extend(int(t) for t in pdf["ts_us"])
    if not ts:
        return
    ts.sort()
    out = []
    for t in ts:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > SESSION_GAP_US:
            out.append((key[0], closed, n, start, last))
            closed += 1
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    state.update((start, last, n, closed))
    if out:
        yield pd.DataFrame(out, columns=[
            "user_id", "session_idx", "n_events", "start_us", "end_us"])


def stream_sessions(spark: SparkSession, events_dir: str, out_dir: str,
                    checkpoint_dir: str) -> None:
    """Drain all unseen event files (availableNow) and append every
    session CLOSED by the drained data to ``out_dir``; open sessions
    ride in the checkpointed state and close (or keep growing) on later
    drains -- the continuous-ingestion sessionization shape."""
    stream = (spark.readStream.schema(EVENTS_DDL).parquet(events_dir)
              .withColumn("ts_us", F.unix_micros(
                  F.col("ts").cast("timestamp")))
              .select("user_id", "ts_us"))
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn, SESS_OUT_SCHEMA, SESS_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)
    q = (sessions.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
