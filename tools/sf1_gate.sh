#!/bin/bash
# Standing sf1 correctness gate: re-verify the scale family
# (SparkEntry.scaleFamily) rows+schema+hash against DuckDB
# on the 10x data point, and write the driver-shaped artifact.
#
#   tools/sf1_gate.sh <roundN>       # -> CORRECTNESS_sf1_r{N}.json
#
# Regenerate the data first if testdata/sf1 is absent:
#   python3 tools/make_scale_data.py 1
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: sf1_gate.sh <roundN>}"
OUT=/tmp/verify_sf1
SPARK_GRAFT_VERIFY_ONLY=@scale SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify testdata/sf1 $OUT" >/dev/null
python3 tools/oracle_check.py testdata/sf1 "$OUT" \
  "CORRECTNESS_sf1_r${ROUND}.json"
