"""Live progress ticker for long-running builds — the literal analog of
the reference loader's 1-second status goroutine (companybindex
main.go:283-313: reads/inserts/skips with per-second rates), re-expressed
over Spark's StatusTracker.

The per-stage row counts/rates land durably in the metrics table via
df.observe (engine/index_build.py); this ticker is the *interactive* view:
a daemon thread prints one line per interval with the active stages and
cumulative task completion, so a 100 TB build is never a black box while
running. Pure driver-side polling — zero effect on the job plan.
"""

from __future__ import annotations

import sys
import threading
import time
from contextlib import contextmanager


@contextmanager
def ticker(spark, interval: float = 1.0, out=sys.stderr):
    """Print `[tick] stages=<active> tasks=<done>/<total> (+rate/s)` every
    `interval` seconds while the body runs."""
    tracker = spark.sparkContext.statusTracker()
    stop = threading.Event()
    state = {"last_done": 0, "last_t": time.monotonic()}

    def loop() -> None:
        while not stop.wait(interval):
            try:
                stage_ids = tracker.getActiveStageIds()
                done = total = 0
                for sid in stage_ids:
                    info = tracker.getStageInfo(sid)
                    if info is None:
                        continue
                    done += info.numCompletedTasks
                    total += info.numTasks
                now = time.monotonic()
                rate = (done - state["last_done"]) / max(now - state["last_t"], 1e-9)
                state["last_done"], state["last_t"] = done, now
                print(
                    f"[tick] stages={len(stage_ids)} tasks={done}/{total} "
                    f"(+{max(rate, 0.0):.1f}/s)",
                    file=out,
                    flush=True,
                )
            except Exception:  # tracker races with job teardown; keep ticking
                pass

    t = threading.Thread(target=loop, daemon=True, name="progress-ticker")
    t.start()
    try:
        yield
    finally:
        stop.set()
        t.join(timeout=2.0)
