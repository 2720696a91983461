#!/usr/bin/env bash
# Best-of-N scaling evidence: this sandbox's background memory compaction
# adds +-2x run-to-run noise, so each (cores) leg runs ROUNDS times and the
# report takes the best throughput per leg (closest to the un-interfered
# machine). Alternating legs so drift hits both equally.
set -euo pipefail
cd "$(dirname "$0")/.."
DOCS="${SPARK_GRAFT_SCALE_DOCS:-120000}"
ROUNDS="${SPARK_GRAFT_SCALE_ROUNDS:-3}"

mkdir -p dist
rm -f dist/engine.zip
zip -qr dist/engine.zip engine -x 'engine/__pycache__/*'

for i in $(seq 1 "$ROUNDS"); do
  for CORES in 8 32; do
    echo "=== round $i local[$CORES] ===" >&2
    SPARK_GRAFT_MASTER="local[$CORES]" \
    SPARK_GRAFT_SHUFFLE="$((CORES * 2))" \
    SPARK_GRAFT_DRIVER_MEM=4g \
    spark-submit --master "local[$CORES]" --driver-memory 4g \
      --conf spark.sql.shuffle.partitions=$((CORES * 2)) \
      --py-files dist/engine.zip \
      cli.py bench-build --docs "$DOCS" --output "/tmp/scale_${CORES}_r${i}.json" \
      2>/dev/null | tail -1
  done
done

python scripts/scaling_report.py "/tmp/scale_8_r*.json" "/tmp/scale_32_r*.json"
