"""A/B harness for the term_encode shuffle-width experiment (BENCH.md §15).

Builds the bench corpus index alternating term_encode="string" / "hash"
N pairs at the given core count, printing per-build wall seconds and the
pair-wise deltas — alternation keeps host drift out of the comparison
(the BENCH.md §9 discipline).

Usage: python scripts/ab_term_encode.py [cpus] [pairs] [n_docs]
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
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 120_000

    from engine import synth
    from engine.index_build import build_index
    from engine.session import get_spark

    spark = get_spark("ab-term-encode", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth.cached_pages(n_docs)
    work = tempfile.mkdtemp(prefix="sparkft_ab_")

    # untimed warm-up (JVM/python-worker spin-up, same as bench.py)
    build_index(
        spark, synth.cached_pages(10_000), os.path.join(work, "warm"),
        n_shards=8, n_buckets=32, bucket_chunk=32,
    )

    times: dict[str, list[float]] = {"string": [], "hash": []}
    for i in range(pairs):
        for mode in ("string", "hash") if i % 2 == 0 else ("hash", "string"):
            out = os.path.join(work, f"idx_{mode}_{i}")
            t0 = time.time()
            build_index(
                spark, corpus, out, n_shards=8, n_buckets=32,
                bucket_chunk=32, term_encode=mode,
            )
            dt = time.time() - t0
            times[mode].append(round(dt, 2))
            shutil.rmtree(out, ignore_errors=True)
            print(f"pair {i} {mode}: {dt:.2f}s", flush=True)
    shutil.rmtree(work, ignore_errors=True)
    med = {m: sorted(v)[len(v) // 2] for m, v in times.items()}
    print(json.dumps({
        "cpus": int(cpus), "n_docs": n_docs, "pairs": pairs,
        "string_s": times["string"], "hash_s": times["hash"],
        "string_median_s": med["string"], "hash_median_s": med["hash"],
        "hash_vs_string_pct": round(
            100.0 * (med["hash"] - med["string"]) / med["string"], 1
        ),
        "string_docs_per_s": round(n_docs / med["string"], 1),
        "hash_docs_per_s": round(n_docs / med["hash"], 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
