#!/bin/bash
# Round-17 END-OF-ROUND measurements at the optimized HEAD:
#  0. preserve the interrupted session's tier benches as *_preopt_*
#     (the before record stays in-tree next to the after)
#  1. tier benches sf0.1 / sf1 / sf5 at the optimized HEAD
#  2. sf5 oracle re-check of the queries whose code paths this round
#     touched (stateful streams + maintain/admission loops) — results
#     must be identical (the full single-HEAD sf5 sweep ran earlier
#     this round; only the touched subset needs re-proving)
#  3. refresh TIERS.json digests for the regenerated sf5 tier
set -uo pipefail
cd /root/repo

for t in sf0.1 sf1 sf5; do
  for s in "" _detail; do
    [ -f "BENCH_r17_${t}${s}.json" ] && cp -n "BENCH_r17_${t}${s}.json" "BENCH_r17_preopt_${t}${s}.json"
  done
done

bench() { # <sfdir> <tag>
  echo "=== bench $2 ($(date +%H:%M:%S)) ==="
  find "$1" -type f -exec cat {} + >/dev/null 2>&1 || true
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | sed 's/^\[info\] //' > "BENCH_r17_$2.json"
  cp BENCH_DETAIL.json "BENCH_r17_${2}_detail.json"
  head -c 300 "BENCH_r17_$2.json"; echo
}
bench /root/testdata/sf0.1 sf0.1
bench testdata-local/sf1 sf1
bench testdata-local5/sf5 sf5

echo "=== sf5 changed-query oracle re-check ($(date +%H:%M:%S)) ==="
Q=stream_window_agg,stream_sliding_agg,stream_session_window,stream_state_mgmt,stream_state_tws,stream_stream_join,stream_dedup,stream_bm25_maintain,stream_ann_maintain,stream_dedup_maintain,stream_dedup_admission,dedup_incremental,dedup_incremental_bucketed
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify testdata-local5/sf5 /tmp/v17_sf5c $Q" 2>&1 \
  | grep -E '\[verify\].*failed' || true
python3 tools/check.py /tmp/v17_sf5c testdata-local5/sf5 --cache --timeout-sec=3000 \
  --json=CORRECTNESS_r17_sf5_changed.json | tail -4

echo "=== sf5 tier digest refresh ($(date +%H:%M:%S)) ==="
python3 tools/tier_digest.py testdata-local5/sf5 2>&1 | tail -2

echo "=== r17 final DONE ($(date +%H:%M:%S)) ==="
