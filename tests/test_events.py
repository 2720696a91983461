"""Event operators: windowed aggregation, sessionization (batch window
functions vs applyInPandasWithState streaming twin), watermark late-data
drop, JSON prop extraction. Cross-engine checks go against DuckDB on the
driver's sf0.001 events table (the same comparison the driver gate runs
at sf0.01 via __spark_entry__)."""

from __future__ import annotations

import os
import time

import duckdb
import pandas as pd

from engine.events import (
    DEFAULT_GAP_S,
    extract_prop,
    session_stats,
    session_window_stats,
    sessionize,
    sessionize_stateful,
    sliding_event_stats,
    stream_windowed_stats,
    windowed_event_stats,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _events(spark):
    return spark.read.parquet(EVENTS)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _assert_frames_equal(spark_df, sql: str):
    got = _canon(spark_df.toPandas())
    want = _canon(duckdb.sql(sql).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_windowed_stats_matches_duckdb(spark):
    df = windowed_event_stats(_events(spark), window_s=21600)
    _assert_frames_equal(
        df,
        f"""
        SELECT (floor(epoch(ts)/21600)*21600)::BIGINT AS ws, event_type,
               count(*) AS n_events, count(DISTINCT user_id) AS n_users,
               round(sum(value), 6) AS sum_value, round(avg(value), 6) AS avg_value
        FROM '{EVENTS}' WHERE ts IS NOT NULL GROUP BY 1, 2
        """,
    )


def test_sessionize_matches_duckdb(spark):
    df = sessionize(_events(spark), gap_s=DEFAULT_GAP_S)
    _assert_frames_equal(
        df,
        f"""
        WITH e AS (
          SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS ts_epoch
          FROM '{EVENTS}' WHERE ts IS NOT NULL
        ),
        f AS (
          SELECT *, CASE WHEN lag(ts_epoch) OVER w IS NULL
                          OR ts_epoch - lag(ts_epoch) OVER w > {DEFAULT_GAP_S}
                     THEN 1 ELSE 0 END AS is_new
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_epoch, event_id)
        )
        SELECT event_id, user_id, ts_epoch,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_epoch, event_id)::BIGINT AS session_seq
        FROM f
        """,
    )


def test_sliding_stats_matches_duckdb(spark):
    df = sliding_event_stats(_events(spark), window_s=21600)
    _assert_frames_equal(
        df,
        f"""
        WITH e AS (
          SELECT event_type, value,
                 (floor(epoch(ts)/10800)*10800)::BIGINT AS base
          FROM '{EVENTS}' WHERE ts IS NOT NULL
        ),
        x AS (SELECT event_type, value, base - k*10800 AS ws
              FROM e, unnest([0, 1]) AS t(k))
        SELECT ws, event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
        FROM x GROUP BY 1, 2
        """,
    )


def test_sliding_stats_rejects_zero_slide(spark):
    import pytest

    with pytest.raises(ValueError):
        sliding_event_stats(_events(spark), window_s=1)  # derived slide 0
    with pytest.raises(ValueError):
        sliding_event_stats(_events(spark), window_s=60, slide_s=0)


def test_session_window_matches_duckdb(spark):
    """Native session_window vs a microsecond-precision DuckDB rebuild of
    its gap-merge rule (split strictly beyond the gap)."""
    df = session_window_stats(_events(spark), gap_s=DEFAULT_GAP_S)
    _assert_frames_equal(
        df,
        f"""
        WITH e AS (
          SELECT user_id, value, event_id, epoch_us(ts) AS tu,
                 floor(epoch(ts))::BIGINT AS ts_s
          FROM '{EVENTS}' WHERE ts IS NOT NULL
        ),
        f AS (
          SELECT *, CASE WHEN lag(tu) OVER w IS NULL
                          OR tu - lag(tu) OVER w > {DEFAULT_GAP_S * 1000000}
                     THEN 1 ELSE 0 END AS is_new
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
        ),
        s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS seq FROM f)
        SELECT user_id, min(ts_s) AS ws, (max(ts_s) + {DEFAULT_GAP_S}) AS we,
               count(*) AS n_events, round(sum(value), 6) AS sum_value
        FROM s GROUP BY user_id, seq
        """,
    )


def test_session_window_boundary_semantics(spark):
    """Frozen native-operator boundary rule: an event exactly gap after
    its predecessor MERGES (split at diff > gap, microsecond precision) —
    user 7 merges at the exact boundary, user 8 splits at gap + 1 us."""
    g_ns = DEFAULT_GAP_S * 10**9
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime([0, g_ns, 0, g_ns + 1000]),
            "user_id": [7, 7, 8, 8],
            "event_type": ["click"] * 4,
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    df = spark.createDataFrame(pdf)
    out = session_window_stats(df, gap_s=DEFAULT_GAP_S).collect()
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert by_user[7] == [2]  # exact-boundary event merged
    assert sorted(by_user[8]) == [1, 1]  # 1 us past the gap -> split


def test_session_stats_shape(spark):
    st = session_stats(_events(spark), gap_s=DEFAULT_GAP_S).toPandas()
    ev = sessionize(_events(spark), gap_s=DEFAULT_GAP_S).toPandas()
    assert st["n_events"].sum() == len(ev)
    assert (st["duration_s"] >= 0).all()
    # session_seq per user is dense 1..max
    per_user = st.groupby("user_id")["session_seq"]
    assert (per_user.max() == per_user.count()).all()


def test_extract_prop_matches_duckdb(spark):
    df = extract_prop(_events(spark), key="k")
    _assert_frames_equal(
        df,
        f"""
        SELECT event_id, event_type, (props->>'$.k')::BIGINT AS prop
        FROM '{EVENTS}'
        """,
    )


from tests.conftest import plan_of as _plan  # noqa: E402


def test_windowed_stats_plan_has_partial_aggregation(spark):
    """The windowed agg must shuffle pre-aggregated partials (map-side
    combine), not raw events — at 100 TB the shuffle carries one row per
    (window, event_type) per map task, not per event."""
    plan = _plan(windowed_event_stats(_events(spark)))
    assert plan.count("HashAggregate") >= 2, plan  # partial + final
    # column pruning reaches the scan: props (the wide column) is not read
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "props" not in read_schema[0], plan


def test_sessionize_plan_single_shuffle(spark):
    """Session assignment is ONE shuffle on user_id: both window functions
    (lag + running sum) share the same partitioning, so Catalyst plans a
    single Exchange — the property that keeps per-user state cheap at
    scale."""
    plan = _plan(sessionize(_events(spark)))
    n_exchange = sum(
        1 for ln in plan.splitlines() if ln.strip().startswith("(") and "Exchange" in ln
    )
    assert n_exchange == 1, plan


def _write_ordered_files(dirpath, frames):
    os.makedirs(dirpath, exist_ok=True)
    t = time.time() - len(frames) * 10
    for i, pdf in enumerate(frames):
        p = os.path.join(dirpath, f"{i:03d}.parquet")
        pdf.to_parquet(p, index=False)
        os.utime(p, (t + i * 10, t + i * 10))  # oldest-first trigger order


def test_streaming_windowed_drops_late_rows(spark, tmp_path):
    """Watermark contract: a row arriving later than the watermark is
    dropped from its (already finalized) window; append mode emits a
    window exactly once after the watermark passes its end. Driven as
    three availableNow runs over one checkpoint, so the watermark and
    window state also survive a stop/restart."""
    t0 = 1_700_000_000 - (1_700_000_000 % 21600)  # window-aligned base
    mk = lambda rows: pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).astype({"ts": "datetime64[us]"})
    ts = lambda s: pd.Timestamp(t0 + s, unit="s")
    on_time = mk(
        [
            (1, ts(100), 1, "click", 1.0, "{}"),
            (2, ts(7200), 2, "click", 2.0, "{}"),
        ]
    )
    advance = mk([(3, ts(48 * 3600), 3, "view", 1.0, "{}")])  # watermark -> t0+36h
    late = mk([(4, ts(3600), 4, "click", 8.0, "{}")])  # older than watermark
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "stream_ckpt")
    outs: list = []
    for i, pdf in enumerate([on_time, advance, late]):
        _write_ordered_files(src, [pdf]) if i == 0 else pdf.to_parquet(
            os.path.join(src, f"{i:03d}.parquet"), index=False
        )
        q = stream_windowed_stats(
            spark, src, f"win_late_{i}", window_s=21600, watermark="12 hours",
            checkpoint_dir=ckpt, collector=outs,
        )
        q.awaitTermination(120)
    assert outs, "no finalized windows were emitted"
    out = pd.concat(outs, ignore_index=True)
    first = out[out["ws"] == t0]
    # finalized first window counts ONLY the on-time rows; the late row
    # (event 4, same window, arrived after the watermark passed) is dropped
    assert len(first) == 1, out
    assert int(first["n_events"].iloc[0]) == 2
    assert float(first["sum_value"].iloc[0]) == 3.0


def test_sessionize_stateful_matches_batch(spark, tmp_path):
    """applyInPandasWithState streaming sessionization == batch window-
    function sessionize, event for event, when the stream drains the same
    events in timestamp order (4 micro-batches)."""
    full = pd.read_parquet(EVENTS).sort_values(["ts", "event_id"]).reset_index(drop=True)
    quarters = [full.iloc[j * len(full) // 4 : (j + 1) * len(full) // 4] for j in range(4)]
    src = str(tmp_path / "sess_src")
    _write_ordered_files(src, quarters)

    q = sessionize_stateful(spark, src, "sess_stateful_test")
    q.awaitTermination(180)
    got = _canon(spark.table("sess_stateful_test").toPandas())
    want = _canon(sessionize(_events(spark), gap_s=DEFAULT_GAP_S).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_session_update_skips_empty_microbatch():
    """A group arriving with only empty Arrow chunks must not write a null
    last_ts into the state (ADVICE round 2)."""
    import pandas as pd

    from engine.events import _make_session_update

    class FakeState:
        def __init__(self):
            self.exists = False
            self.updated = None

        def update(self, v):
            self.updated = v

    upd = _make_session_update(30)
    st = FakeState()
    out = list(upd((7,), iter([pd.DataFrame({"event_id": [], "ts_epoch": []})]), st))
    assert out == []
    assert st.updated is None  # no state write for a no-row batch

    # and a real batch still updates state
    st2 = FakeState()
    out2 = list(
        upd((7,), iter([pd.DataFrame({"event_id": [1, 2], "ts_epoch": [10, 100]})]), st2)
    )
    assert len(out2) == 1 and st2.updated == (100, 2)
