"""Turn two bench-build JSONs (N and 4N cores) into the BENCH.md scaling
section required by the north rule (efficiency >= 0.8 target)."""

from __future__ import annotations

import json
import sys


def main() -> None:
    small, big = sys.argv[1], sys.argv[2]
    with open(small) as f:
        a = json.loads(f.read())
    with open(big) as f:
        b = json.loads(f.read())
    ratio = b["cores"] / a["cores"]
    eff = b["docs_per_sec"] / (ratio * a["docs_per_sec"])
    section = f"""## Scaling evidence (N vs 4N, north rule)

Same job (`cli.py bench-build`, {a['docs']} synthetic web docs, fused
index build + 20 frozen BM25 queries) submitted via
`spark-submit --py-files dist/engine.zip` at two parallelism levels —
the sandbox stand-in for N and 4N executors:

| cores | build sec | docs/sec | query p50 | query p95 |
|---|---|---|---|---|
| local[{a['cores']}] | {a['build_sec']} | {a['docs_per_sec']} | {a['query_p50_sec']} | {a['query_p95_sec']} |
| local[{b['cores']}] | {b['build_sec']} | {b['docs_per_sec']} | {b['query_p50_sec']} | {b['query_p95_sec']} |

**Scaling efficiency (build throughput): {eff:.2f}** =
{b['docs_per_sec']} / ({ratio:.0f} x {a['docs_per_sec']})
(target >= 0.8).
"""
    print(section)
    with open("/tmp/scaling_section.md", "w") as f:
        f.write(section)


if __name__ == "__main__":
    main()
