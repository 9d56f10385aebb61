#!/bin/sh
# Standing sf0.1 "stretch check": run registered queries at the NEXT
# scale factor up from the sf0.01 gate and hash-compare against DuckDB.
# Operators whose oracles only diverge once data volume triggers a new
# code path (r9: t41's cap first split at sf0.1, t52's entropy grain)
# fail HERE before the driver's gate ever sees them. Run it for every
# new/changed operator before registration; run it with no filter
# before closing a round.
#
# Usage: tools/stretch_check.sh [sfDir] [outDir] [queryPrefixFilter]
#   tools/stretch_check.sh                          # full registry, sf0.1
#   tools/stretch_check.sh /root/testdata/sf0.1 /tmp/so t41,t44
set -e
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/stretch_out}
FILTER=${3:-}
rm -rf "$OUT"
if [ -n "$FILTER" ]; then
  sbt -batch "runMain graft.Verify $SF $OUT $FILTER"
else
  sbt -batch "runMain graft.Verify $SF $OUT"
fi
python3 "$(dirname "$0")/check_oracle.py" "$OUT" "$SF"
