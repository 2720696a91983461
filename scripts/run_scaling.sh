#!/usr/bin/env bash
# North-rule scaling evidence: the same index build + query job at N and 4N
# parallelism (local[8] vs local[32] — no real cluster in this sandbox),
# submitted the cluster way: spark-submit --py-files dist/engine.zip.
# Writes /tmp/scale_8.json and /tmp/scale_32.json; scripts/scaling_report.py
# turns them into the BENCH.md table.
set -euo pipefail
cd "$(dirname "$0")/.."

DOCS="${SPARK_GRAFT_SCALE_DOCS:-120000}"

mkdir -p dist
rm -f dist/engine.zip
(cd . && zip -qr dist/engine.zip engine -x 'engine/__pycache__/*')

for CORES in 8 32; do
  echo "=== local[$CORES] ==="
  SPARK_GRAFT_MASTER="local[$CORES]" \
  SPARK_GRAFT_SHUFFLE="$((CORES * 2))" \
  SPARK_GRAFT_DRIVER_MEM=4g \
  spark-submit --master "local[$CORES]" --driver-memory 4g \
    --conf spark.sql.shuffle.partitions=$((CORES * 2)) \
    --py-files dist/engine.zip \
    cli.py bench-build --docs "$DOCS" --output "/tmp/scale_${CORES}.json" \
    2>/dev/null | tail -1
done

python scripts/scaling_report.py /tmp/scale_8.json /tmp/scale_32.json
