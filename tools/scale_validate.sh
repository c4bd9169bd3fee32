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

# Spark cannot write parquet TIMESTAMP(NANOS); ScaleUp lands events.ts as
# BIGINT nanos (reading it with nanosAsLong, like every Spark consumer
# here). The DuckDB oracle needs the driver's nanos-timestamp type, so
# restore it with pyarrow (dev-side tool, like selfcheck itself).
python3 - "$PWD/$DEST" <<'PYEOF'
import pyarrow as pa, pyarrow.parquet as pq, glob, shutil, sys, os
dest = sys.argv[1]
path = f"{dest}/events.parquet"
if os.path.isdir(path):
    tbl = pa.concat_tables([pq.read_table(f) for f in sorted(glob.glob(f"{path}/*.parquet"))])
    i = tbl.schema.get_field_index('ts')
    tbl = tbl.set_column(i, pa.field('ts', pa.timestamp('ns')), tbl.column('ts').cast(pa.timestamp('ns')))
    shutil.rmtree(path)
    pq.write_table(tbl, path)
PYEOF

for i in $(seq 1 "$RUNS"); do
  SPARK_GRAFT_SF_DIR="$PWD/$DEST" sbt -batch -error "runMain graft.Bench" \
    2>/dev/null | grep '"metric"' > "/tmp/bench_sf_x${FACTOR}_run$i.json"
  echo "bench run $i done"
done

rm -rf "/tmp/verify_sf_x$FACTOR"
sbt -batch "runMain graft.Verify $PWD/$DEST /tmp/verify_sf_x$FACTOR"
python3 tools/selfcheck.py "$PWD/$DEST" "/tmp/verify_sf_x$FACTOR" \
  | tee "/tmp/selfcheck_sf_x$FACTOR.txt"
