#!/bin/bash
# Scale validation: derive a 10x corpus from the driver's sf0.1 data,
# bench the full registry on it, and oracle-check correctness at 10x.
#
# Usage: tools/scale_validate.sh [factor] [runs]
#   factor: replication factor (default 10 -> "sf1")
#   runs:   bench repetitions for the minima rule (default 3; BASELINE.md
#           forbids judging per-query perf from fewer on this host)
#
# Outputs: /tmp/bench_sfN_run{i}.json, /tmp/verify_sfN/, /tmp/selfcheck_sfN.txt
set -euo pipefail
cd "$(dirname "$0")/.."
FACTOR="${1:-10}"
RUNS="${2:-3}"
DEST="scratch/sf_x$FACTOR"

sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 $PWD/$DEST $FACTOR"

for i in $(seq 1 "$RUNS"); do
  SPARK_GRAFT_SF_DIR="$PWD/$DEST" sbt -batch -error "runMain graft.Bench" \
    2>/dev/null | grep '"metric"' > "/tmp/bench_sf_x${FACTOR}_run$i.json"
  echo "bench run $i done"
done

rm -rf "/tmp/verify_sf_x$FACTOR"
sbt -batch "runMain graft.Verify $PWD/$DEST /tmp/verify_sf_x$FACTOR"
python3 tools/selfcheck.py "$PWD/$DEST" "/tmp/verify_sf_x$FACTOR" \
  | tee "/tmp/selfcheck_sf_x$FACTOR.txt"
