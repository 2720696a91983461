"""Progress ticker (S8 interactive analog): emits tick lines while a job
runs, stops cleanly, and never perturbs the job result."""

from __future__ import annotations

import io
import time

import pandas as pd
from pyspark.sql import functions as F

from engine.progress import ticker


def test_ticker_emits_lines_during_job(spark):
    @F.pandas_udf("long")
    def slow(x: pd.Series) -> pd.Series:
        time.sleep(0.15)
        return x

    buf = io.StringIO()
    df = spark.range(64).repartition(32).select(F.sum(slow("id")).alias("s"))
    with ticker(spark, interval=0.2, out=buf):
        got = df.collect()[0]["s"]
    assert got == sum(range(64))
    lines = [ln for ln in buf.getvalue().splitlines() if ln.startswith("[tick]")]
    assert lines, buf.getvalue()
    assert "tasks=" in lines[-1] and "stages=" in lines[-1]
    # thread stopped: no more lines after the context exits
    n = len(lines)
    time.sleep(0.5)
    assert len([ln for ln in buf.getvalue().splitlines() if ln.startswith("[tick]")]) == n
