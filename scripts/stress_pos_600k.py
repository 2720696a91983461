"""600k-doc positional stress (BENCH.md §12 re-run after the round-5
position-stream block skipping): full positional build, the 20 frozen
queries, and 10 corpus bigram/trigram phrases with p50/p95.

Usage: python scripts/stress_pos_600k.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000

    from engine import synth
    from engine.index_build import build_index
    from engine.query import IndexReader, bm25_topk_rows, match_phrase_topk
    from engine.session import get_spark

    spark = get_spark("stress-pos", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth.cached_pages(n_docs)
    work = tempfile.mkdtemp(prefix="sparkft_stress_")
    idx = os.path.join(work, "idx")
    t0 = time.time()
    man = build_index(
        spark, corpus, idx, n_shards=32, n_buckets=32, bucket_chunk=32,
        index_options="positions",
    )
    build_s = time.time() - t0
    reader = IndexReader(spark, idx)

    qs = synth.frozen_queries()
    lat = []
    for q in qs:
        t0 = time.time()
        bm25_topk_rows(reader, q["terms"], k=10)
        lat.append(time.time() - t0)
    lat.sort()

    from pyspark.sql import functions as F

    sample = spark.read.parquet(corpus).select("text").limit(8).collect()
    phrases = []
    for r in sample:
        toks = r["text"].lower().split()
        if len(toks) >= 3:
            phrases.append(" ".join(toks[1:3]))
            phrases.append(" ".join(toks[4:7]))
    phrases = list(dict.fromkeys(p for p in phrases if p))[:10]
    plat = []
    for ph in phrases:
        t0 = time.time()
        match_phrase_topk(reader, ph, k=10).collect()
        plat.append(time.time() - t0)
    plat.sort()

    def pct(a, p):
        return round(a[min(len(a) - 1, int(p * len(a)))], 3)

    print(json.dumps({
        "n_docs": man["n_docs"],
        "build_s": round(build_s, 1),
        "docs_per_s": round(man["n_docs"] / build_s, 1),
        "bm25_p50": pct(lat, 0.5), "bm25_p95": pct(lat, 0.95),
        "phrase_p50": pct(plat, 0.5), "phrase_p95": pct(plat, 0.95),
        "n_phrases": len(phrases),
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
