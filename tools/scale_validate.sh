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

# Driver fixtures have shipped events.ts as TIMESTAMP(NANOS) and as
# TIMESTAMP(MICROS) across generations. On the nanos vintage Spark can
# only read/write it as BIGINT nanos (nanosAsLong), so ScaleUp lands a
# BIGINT column the DuckDB oracle can't treat as a timestamp — restore
# the nanos-timestamp type with pyarrow (dev-side tool, like selfcheck).
# On the native-timestamp vintage ScaleUp already writes a real
# timestamp column: leave it exactly as the driver ships it.
python3 - "$PWD/$DEST" <<'PYEOF'
import pyarrow as pa, pyarrow.parquet as pq, glob, shutil, sys, os
dest = sys.argv[1]
path = f"{dest}/events.parquet"
if os.path.isdir(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if files and pq.read_schema(files[0]).field('ts').type == pa.int64():
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
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
