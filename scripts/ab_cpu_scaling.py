"""CPU-ceiling scaling leg (BENCH.md §19): a compute-dominated ENGINE job
at local[8] vs local[32].

BENCH §17 laddered the index build (memory-bandwidth-bound on this host)
and bounded the sandbox itself with zero-Spark probes: pure-Python CPU
caps at 0.76 efficiency for 8->32 procs, page writes at 0.64. What §17
could not show is an actual engine workload reaching that host ceiling —
that is this script's job.

Workload: MinHash signatures with k=128 permutations over the sf0.1
documents table (engine/dedup.minhash_signatures — the same code path as
the `dedup_minhash_sig` driver query, wider k). Per exploded shingle the
partial aggregate evaluates 128 multiply-mod-min updates in whole-stage
codegen, ~10^9-10^10 integer ops per run over a ~100 MB input: arithmetic
dominates memory traffic, matching the profile of the pure-CPU probe. If
the engine adds no serialization, its 8->32 efficiency should approach
the probe's 0.76 — that is the claim under test.

Usage: python scripts/ab_cpu_scaling.py <cores> <sf_dir> [k]
Prints one JSON line: {"cores": N, "k": K, "runs_sec": [...], "docs": D}
(run 0 is the warmup and is NOT in runs_sec). Drive alternating rungs
from the shell so each measurement gets a fresh JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    sf_dir = sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    os.environ["SPARK_GRAFT_MASTER"] = f"local[{cores}]"
    os.environ["SPARK_GRAFT_SHUFFLE"] = str(cores * 2)

    from engine.dedup import minhash_signatures
    from engine.session import get_spark

    spark = get_spark(app_name=f"ab-cpu-{cores}")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # The sf0.1 table is one ~MB-scale parquet split; unsplit it scans as a
    # single task and the whole job serializes no matter the core count. At
    # 100 TB the input brings thousands of splits, so give each rung the
    # split count its core count would see: 2 tasks per core.
    docs = docs.repartition(cores * 2)
    n_docs = docs.count()  # also warms the OS page cache for the input

    runs = []
    for i in range(3):  # run 0 = JVM/codegen warmup, runs 1-2 timed
        t0 = time.time()
        minhash_signatures(docs, k=k).count()
        dt = round(time.time() - t0, 3)
        if i > 0:
            runs.append(dt)
    print(json.dumps({"cores": cores, "k": k, "runs_sec": runs, "docs": n_docs}))
    spark.stop()


if __name__ == "__main__":
    main()
