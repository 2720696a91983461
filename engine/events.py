"""Event-stream operators over an events table
`(event_id, ts, user_id, event_type, value, props:json-string)`.

The reference's only streaming-shaped behavior is its 1 s metrics tick and
30 s refresh interval (SURVEY.md 2.10 ST1/ST2); segment ingest/merge lives
in engine/streaming.py. This module adds the windowed / stateful event
operators a large-scale training-data pipeline needs on top of that:

- `windowed_event_stats`: tumbling-window aggregation (idiomatic
  `F.window` groupBy — the ST1 "metrics tick" generalized to arbitrary
  widths). Batch form is SQL-expressible and DuckDB-oracled; the same plan
  runs under Structured Streaming with a watermark
  (`stream_windowed_stats`), where late-beyond-watermark rows are dropped.
- `sessionize` / `session_stats`: gap-based session assignment as pure
  window functions (lag + running sum — one shuffle on user_id), and the
  per-session rollup. The streaming twin `sessionize_stateful` runs the
  same semantics with `applyInPandasWithState` (explicit per-user state:
  last event time + session counter), tested event-for-event identical to
  the batch plan on a drained in-order stream.
- `extract_prop`: JSON property extraction (`get_json_object`), the
  from_json surface of SURVEY 2.9.

Timestamps are compared cross-engine as epoch seconds (LONG): Spark's
timestamp->long cast and `F.window(...).start` both work on the internal
UTC micros, and DuckDB's `epoch()` reads the same parquet micros verbatim
— no session-timezone dependence in any output column.

Scale notes: windowed stats shuffle once on (window, event_type) with
map-side partial aggregation; sessionize shuffles once on user_id (the
natural partitioning for per-user state at any scale — a hot user is
bounded by their own event count, and the stateful streaming form keeps
O(1) state per user, not per event).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_WINDOW_S = 6 * 3600
DEFAULT_GAP_S = 4 * 3600

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _epoch_expr(col_sql: str, is_ntz: bool):
    """Epoch seconds from a timestamp column, timezone-free either way:
    TIMESTAMP_NTZ (what Spark 4 infers for parquet naive timestamps) via
    pure naive timestampdiff arithmetic; TIMESTAMP via the instant cast.
    Neither consults the session timezone, so it matches DuckDB's
    floor(epoch(ts)) on the same parquet micros verbatim. (timestampdiff
    truncates toward zero, floor() floors — identical for post-1970
    timestamps, a documented 1 s divergence for pre-epoch data.)"""
    if is_ntz:
        return F.expr(f"timestampdiff(SECOND, {_NTZ_EPOCH}, {col_sql})")
    return F.expr(f"CAST({col_sql} AS LONG)")


def _ts_is_ntz(df: DataFrame, col: str = "ts") -> bool:
    return dict(df.dtypes).get(col) == "timestamp_ntz"


def windowed_event_stats(events: DataFrame, window_s: int = DEFAULT_WINDOW_S) -> DataFrame:
    """Tumbling-window per-event-type stats:
    (ws, event_type, n_events, n_users, sum_value, avg_value), ws = window
    start as epoch seconds. Exact countDistinct (rank-stable oracle);
    values rounded to 6dp for cross-engine float determinism."""
    is_ntz = _ts_is_ntz(events)
    w = F.window(F.col("ts"), f"{window_s} seconds")
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            _epoch_expr("w.start", is_ntz).alias("ws"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value",
            "avg_value",
        )
    )


def sliding_event_stats(
    events: DataFrame, window_s: int = DEFAULT_WINDOW_S, slide_s: int | None = None
) -> DataFrame:
    """Sliding-window per-event-type stats (window width window_s, slide
    slide_s, default width/2 — each event lands in width/slide windows):
    (ws, event_type, n_events, sum_value). Same shuffle shape as the
    tumbling form; output rows scale by the overlap factor, not the input."""
    if slide_s is None:
        slide_s = window_s // 2
    if slide_s < 1 or window_s < 1:
        raise ValueError(f"window_s and slide_s must be >= 1 (got {window_s}, {slide_s})")
    is_ntz = _ts_is_ntz(events)
    w = F.window(F.col("ts"), f"{window_s} seconds", f"{slide_s} seconds")
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            _epoch_expr("w.start", is_ntz).alias("ws"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_window_stats(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """Per-user session rollup via Spark's NATIVE session_window operator
    (gap-merged event-time windows — the idiomatic form of sessionize +
    session_stats, and the one that runs under Structured Streaming with
    state merge): (user_id, ws, we, n_events, sum_value), ws = first event
    epoch, we = last event epoch + gap (the session_window end).

    Boundary semantics (verified empirically, frozen by test): an event
    exactly gap after its predecessor MERGES into the session — the split
    rule is diff > gap, like sessionize, but evaluated at the native
    MICROsecond precision rather than sessionize's floored-second epochs;
    the DuckDB oracle compares at microseconds accordingly."""
    is_ntz = _ts_is_ntz(events)
    w = F.session_window(F.col("ts"), f"{gap_s} seconds")
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(w.alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            _epoch_expr("w.start", is_ntz).alias("ws"),
            _epoch_expr("w.end", is_ntz).alias("we"),
            "n_events",
            "sum_value",
        )
    )


def extract_prop(events: DataFrame, key: str = "k") -> DataFrame:
    """JSON property extraction from the props column (SURVEY 2.9 JSON
    surface): (event_id, event_type, prop) with prop = $.{key} as long."""
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object(F.col("props"), f"$.{key}").cast("long").alias("prop"),
    )


def sessionize(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """Gap-based session assignment: an event starts a new session when its
    user has no prior event within gap_s seconds. Output one row per event:
    (event_id, user_id, ts_epoch, session_seq) with session_seq the 1-based
    per-user session ordinal. Single shuffle on user_id; lag + running sum
    window functions (no state, no UDF)."""
    e = events.filter(F.col("ts").isNotNull()).select(
        "event_id",
        "user_id",
        _epoch_expr("ts", _ts_is_ntz(events)).alias("ts_epoch"),
    )
    order = Window.partitionBy("user_id").orderBy("ts_epoch", "event_id")
    prev = F.lag("ts_epoch").over(order)
    is_new = F.when(prev.isNull() | (F.col("ts_epoch") - prev > gap_s), 1).otherwise(0)
    return (
        e.withColumn("is_new", is_new)
        .withColumn(
            "session_seq",
            F.sum("is_new").over(order.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select("event_id", "user_id", "ts_epoch", "session_seq")
    )


def session_stats(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """Per-session rollup over sessionize: (user_id, session_seq, n_events,
    start_epoch, end_epoch, duration_s, sum_value)."""
    s = sessionize(events, gap_s)
    vals = events.select("event_id", "value")
    return (
        s.join(vals, "event_id")
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_epoch").alias("start_epoch"),
            F.max("ts_epoch").alias("end_epoch"),
            (F.max("ts_epoch") - F.min("ts_epoch")).alias("duration_s"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Structured Streaming twins
# ---------------------------------------------------------------------------

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_windowed_stats(
    spark: SparkSession,
    source_dir: str,
    out_table: str,
    window_s: int = DEFAULT_WINDOW_S,
    watermark: str = "12 hours",
    max_files_per_trigger: int = 1,
    checkpoint_dir: str | None = None,
    collector: list | None = None,
):
    """Streaming twin of windowed_event_stats: file source -> watermark ->
    tumbling-window agg, append mode (a window emits once its watermark
    passes; rows later than the watermark are dropped — the late-data
    contract tested in tests/test_events.py). Results land in the
    `out_table` in-memory sink, or — when `collector` (a list) is given —
    are appended to it as pandas frames via a foreachBatch sink, which
    unlike the memory sink supports checkpoint recovery. A persistent
    checkpoint_dir carries watermark + window state across restarts
    (tested: stop/restart preserves the late-drop contract)."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    agg = (
        stream.filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), f"{window_s} seconds").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("ws"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    if collector is not None:
        # foreachBatch sink: supports checkpoint recovery (the memory sink
        # does not), so restarted availableNow runs keep watermark + state
        def _collect(batch_df: DataFrame, _batch_id: int) -> None:
            pdf = batch_df.toPandas()
            if len(pdf):
                collector.append(pdf)

        writer = agg.writeStream.outputMode("append").foreachBatch(_collect)
    else:
        writer = agg.writeStream.outputMode("append").format("memory").queryName(out_table)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()


_SESSION_STATE_SCHEMA = "last_ts long, seq long"
_SESSION_OUT_SCHEMA = "event_id long, user_id long, ts_epoch long, session_seq long"


def _make_session_update(gap_s: int):
    """applyInPandasWithState update fn: per-user state = (last event
    epoch, session counter). A micro-batch's group may arrive as MULTIPLE
    Arrow chunks in arbitrary relative order (chunking is a transport
    artifact, > maxRecordsPerBatch rows splits a group) — so all chunks
    are concatenated and sorted by (ts, event_id) ONCE before the state
    walk. State carries across micro-batches, so a drained in-order stream
    reproduces the batch sessionize assignment exactly."""

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, seq = state.get
        else:
            last_ts, seq = None, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out = []
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts_epoch", "event_id"])
            for ev, ts in zip(pdf["event_id"].to_numpy(), pdf["ts_epoch"].to_numpy()):
                if last_ts is None or ts - last_ts > gap_s:
                    seq += 1
                last_ts = int(ts)
                out.append((int(ev), int(key[0]), int(ts), int(seq)))
        if chunks or state.exists:
            # a group whose micro-batch arrived as only-empty chunks has
            # last_ts=None — writing that into the non-null state field
            # would corrupt the (last_ts, seq) carry; skip the no-op update
            state.update((last_ts, seq))
        if out:
            yield pd.DataFrame(
                out, columns=["event_id", "user_id", "ts_epoch", "session_seq"]
            )

    return update


def sessionize_stateful(
    spark: SparkSession,
    source_dir: str,
    out_table: str,
    gap_s: int = DEFAULT_GAP_S,
    max_files_per_trigger: int = 1,
):
    """Streaming sessionization with explicit state (applyInPandasWithState):
    the custom-stateful-operator surface. Output mode update: every event
    row is emitted once, with its session ordinal, as it is processed.
    gap_s must match the batch sessionize call being mirrored."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    assigned = (
        stream.filter(F.col("ts").isNotNull())
        .select("event_id", "user_id", F.col("ts").cast("long").alias("ts_epoch"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_update(gap_s),
            _SESSION_OUT_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    return (
        assigned.writeStream.outputMode("update")
        .format("memory")
        .queryName(out_table)
        .trigger(availableNow=True)
        .start()
    )
