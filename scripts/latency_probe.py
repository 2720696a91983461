"""Serving-path latency probe — reproduces BENCH.md section 5.

Builds a synthetic index (size/parallelism via env), then times the frozen
20-query set three ways over the SAME index bytes:
  rows  — bm25_topk_rows (serving API, no result DataFrame)
  df    — bm25_topk(...).collect() (driver-local kernels + DataFrame)
  spark — bm25_topk(..., execution="spark").collect() (scatter-gather)

Usage: python scripts/latency_probe.py [n_docs=30000] [cpus=8]
Prints one JSON line with p50/p95/min per path.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.session import get_spark  # noqa: E402
from engine import synth  # noqa: E402
from engine.index_build import build_index  # noqa: E402
from engine.query import IndexReader, bm25_topk, bm25_topk_rows  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    cpus = sys.argv[2] if len(sys.argv) > 2 else "8"
    spark = get_spark("latency-probe", master=f"local[{cpus}]")
    work = tempfile.mkdtemp(prefix="latprobe_")
    corpus = os.path.join(work, "pages.parquet")
    synth.write_pages(corpus, n_docs)
    idx = os.path.join(work, "idx")
    build_index(spark, corpus, idx, n_shards=int(cpus), n_buckets=32, bucket_chunk=32)
    reader = IndexReader(spark, idx)
    frozen = synth.frozen_queries()

    paths = {
        "rows": lambda q, m: bm25_topk_rows(reader, q["terms"], k=q["k"], mode=m),
        "df": lambda q, m: bm25_topk(reader, q["terms"], k=q["k"], mode=m).collect(),
        "spark": lambda q, m: bm25_topk(
            reader, q["terms"], k=q["k"], mode=m, execution="spark"
        ).collect(),
    }
    out: dict = {"n_docs": n_docs, "cpus": int(cpus)}
    for name, fn in paths.items():
        fn(frozen[0], "or")  # warm (worker spin-up, cache fill)
        lat: list[float] = []
        for _ in range(3):
            for q in frozen:
                m = synth.MODE_BY_KIND[q["kind"]]
                t0 = time.time()
                fn(q, m)
                lat.append(time.time() - t0)
        lat.sort()
        n = len(lat)
        out[name] = {
            "p50_ms": round(lat[n // 2] * 1000, 1),
            "p95_ms": round(lat[int(n * 0.95)] * 1000, 1),
            "min_ms": round(lat[0] * 1000, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
