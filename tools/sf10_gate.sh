#!/bin/bash
# sf10 scale-family gate: verify the superlinear-watch family
# (rows+schema+hash vs DuckDB where DuckDB can finish; Spark-only row
# checks where it cannot — see oracle_check.py ORACLE_TIMEOUT_S) on the
# 100x data point, writing the driver-shaped artifact.
#
# q45_jaccard_pairs and q57_near_dup_blocked are EXCLUDED here by
# design, not omission: their sf10 result sets are 4.6 B and 1.25 B
# rows (PLANS.md "sf10 point"), so a Verify parquet dump would measure
# the write path, not the operator, and flirt with the disk budget.
# Their sf10 evidence is the ScaleKnobs pair-count/time dials plus the
# BENCH_DETAIL_sf10.json count()-only timings, both committed.
#
#   tools/sf10_gate.sh <roundN>
#
# Regenerate the data first if testdata/sf10 is absent:
#   python3 tools/make_scale_data.py 10
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: sf10_gate.sh <roundN>}"
FAMILY="q23_revenue_topk,q43_minhash_lsh_pairs,q47_dedup_components,"
FAMILY+="q56_regional_revenue,q80_sql_api,q96_recursive_cte,"
FAMILY+="q103_dedup_components_star,q105_seq_pack,q106_det_shard,"
FAMILY+="q107_mixture_resample,q108_source_pctl_filter,"
FAMILY+="q109_incremental_dedup,q110_shard_readback,"
FAMILY+="q114_budget_select,q117_kmv_merge,q118_rolling_dedup"
OUT=/tmp/verify_sf10
SPARK_GRAFT_VERIFY_ONLY="$FAMILY" SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify testdata/sf10 $OUT" >/dev/null
ORACLE_TIMEOUT_S="${ORACLE_TIMEOUT_S:-300}" \
  python3 tools/oracle_check.py testdata/sf10 "$OUT" \
  "CORRECTNESS_sf10_r${ROUND}.json"
