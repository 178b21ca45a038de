"""Streaming analytics over the events table: watermarked windowed
aggregation and a custom stateful sessionizer.

The reference has no streaming analytics at all — its incremental path is a
hand-rolled chunk loop (/root/reference/src/data_io.py:708-778). On Spark the
idiomatic replacements are:

* event-time window aggregation with a watermark (`withWatermark` +
  `groupBy(window(...))`) — late rows inside the watermark still land in
  their window, rows later than the watermark are dropped with bounded
  state; this is how hourly crawl/QPS rollups run continuously at 100 TB
  (state per open window, not per row);
* `applyInPandasWithState` for operators Spark lacks natively — here
  sessionization, whose per-key state is (last event time, session index):
  constant-size state per user, Arrow-batched compute, no per-row Python.

Both run in `Trigger.AvailableNow` drain mode in tests/battery (process the
backlog, emit, stop) — the same code deployed with a live source runs
continuously from the checkpoint.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

# readStream needs an explicit schema (no inference on streaming sources)
EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])



def _tmp_ckpt_dir(prefix: str) -> str:
    """Per-run checkpoint dir, removed at interpreter exit — one shared
    allocator with the incremental streams (tmpfs placement + atexit)."""
    from .incremental import _tmp_sink_dir
    return _tmp_sink_dir(prefix)

def _events_stream(spark: SparkSession, events_path: str):
    """Streaming parquet source over a directory OR a single file.

    The file source requires a directory basePath; the testdata tables are
    single files, so a file path becomes (parent dir + pathGlobFilter) —
    the production layout (a directory of splits) passes through untouched.
    """
    import os

    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if os.path.isfile(events_path):
        parent, fname = os.path.split(events_path)
        return reader.option("pathGlobFilter", fname).parquet(parent)
    return reader.parquet(events_path)


def _drain(query, name: str, spark: SparkSession, timeout_s: int = 300) -> DataFrame:
    """Await an availableNow drain and return the memory-sink table.

    Same partial-output guard as streaming/ingest.py: a timeout means the
    memory table holds a prefix of the batches, so fail loudly instead of
    returning it.
    """
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError(f"streaming query {name} did not drain in {timeout_s}s")
    return spark.table(name)


def stream_windowed_event_stats(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "windowed_event_stats",
) -> DataFrame:
    """Per-(event-time window, event_type) counts + value sums with a
    late-data watermark; drains availableNow into a memory sink.

    Complete output mode so every window is emitted on drain (append mode
    would hold back windows the watermark has not passed — correct for a
    live feed, wrong for a bounded backlog drain). State is one row per
    open (window, type): at 10^12 events that is hours × types, trivially
    bounded; the watermark lets Spark drop window state ``watermark`` after
    the window closes on a live stream.
    """
    stream = _events_stream(spark, events_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )
    ckpt = _tmp_ckpt_dir("ckpt_winagg_")
    q = (
        agg.writeStream.format("memory").queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    return _drain(q, query_name, spark)


SESSION_STATE_SCHEMA = StructType([
    StructField("last_epoch", LongType()),
    StructField("max_session", LongType()),
])

SESSION_OUT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("session_idx", LongType()),
])


def _sessionize_group(key, pdfs, state, gap_s: int = 1800):
    """Stateful per-user sessionizer (runs inside applyInPandasWithState).

    State = (epoch of last event seen, highest session index issued) — two
    longs per user, regardless of history length. Events inside a batch are
    sorted by (ts, event_id); a gap > ``gap_s`` seconds (or a fresh key)
    starts a new session. Feeding batches in event-time order reproduces
    the batch window-function sessionizer exactly (asserted in pytest and
    the battery oracle).
    """
    import numpy as np
    import pandas as pd

    (user_id,) = key
    if state.exists:
        last_epoch, max_session = state.get
    else:
        last_epoch, max_session = None, 0

    frames = []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        epochs = (pdf["ts"].astype("int64") // 1_000_000_000).to_numpy()
        # vectorized: a session break is gap > gap_s vs the previous event
        # (state's last_epoch for the first row; sentinel forces a break on
        # a fresh key), session ids are max_session + cumsum(breaks)
        prev = np.empty_like(epochs)
        prev[1:] = epochs[:-1]
        # fresh-key sentinel just past the gap (int64-min would overflow the diff)
        prev[0] = last_epoch if last_epoch is not None \
            else int(epochs[0]) - gap_s - 1
        sessions = max_session + np.cumsum((epochs - prev) > gap_s)
        last_epoch, max_session = int(epochs[-1]), int(sessions[-1])
        frames.append(pd.DataFrame({
            "event_id": pdf["event_id"].to_numpy(),
            "user_id": user_id,
            "session_idx": sessions,
        }))
    state.update((last_epoch, max_session))
    if frames:
        yield pd.concat(frames, ignore_index=True)


def stream_sessionize_stateful(
    spark: SparkSession,
    events_path: str,
    gap_s: int = 1800,
    query_name: str = "stateful_sessions",
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``.

    The batch engine sessionizes with a lag-window (plans/benchqueries
    ``events_sessionize``); a stream cannot window over all history, so
    per-user state carries (last_ts, session counter) across micro-batches.
    GroupStateTimeout.NoTimeout: sessions never expire from state here —
    a production feed would use EventTimeTimeout + watermark to drop idle
    users' state.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = _events_stream(spark, events_path)
    sessions = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            lambda key, pdfs, state: _sessionize_group(key, pdfs, state, gap_s),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    ckpt = _tmp_ckpt_dir("ckpt_sess_")
    q = (
        sessions.writeStream.format("memory").queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    return _drain(q, query_name, spark)
