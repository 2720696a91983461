"""engine.hashing.xxh64 must be bit-identical to Spark's xxhash64 — the
bucket router depends on it (a mismatch would silently miss postings)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from engine import synth
from engine.hashing import term_bucket, xxh64_signed


def test_xxh64_matches_spark(spark):
    vocab = synth.make_vocab()[:500] + [
        "", "a", "ab", "abc", "abcd", "abcde" * 7, "x" * 31, "y" * 32,
        "z" * 33, "w" * 100, "héllo wörld", "日本語テキスト",
    ]
    df = spark.createDataFrame(pd.DataFrame({"t": vocab}), "t string")
    rows = df.select(
        "t",
        F.xxhash64("t").alias("h"),
        F.pmod(F.xxhash64("t"), F.lit(16)).cast("int").alias("b"),
    ).collect()
    for r in rows:
        assert xxh64_signed(r["t"].encode("utf-8")) == r["h"], r["t"]
        assert term_bucket(r["t"], 16) == r["b"], r["t"]
