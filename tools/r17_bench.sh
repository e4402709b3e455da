#!/bin/bash
# Round-17 artifact pipeline, sequential on a quiet box:
#  1. full 164-query sf5 correctness sweep at HEAD (oracle cache warm
#     from r16 — resumes in minutes unless tier data changed)
#  2. MAINTAIN_r17: single-level vs TIERED policy loops at sf0.1+sf1,
#     PLUS the two new r17 measurements — fold-shape A/B (loose
#     segments vs runs; attributes the r16 39.4 s outlier) and
#     run-vs-segments serve medians (does ONE size-coalesced run of 32
#     serve like one leaf or like 32?)
#  3. tier benches sf0.1 / sf1 / sf5 (headline now carries total_mad)
#  4. ann build soak at 5M vectors: batched-serve kernels A/B,
#     sharded serve (N=4), maintained-session refresh trigger loop
#     (serves_behind_head)
set -uo pipefail
cd /root/repo

echo "=== sf5 full 164-query sweep ($(date +%H:%M:%S)) ==="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify testdata-local5/sf5 /tmp/v17_sf5" 2>&1 \
  | grep -E '\[verify\].*failed' || true
python3 tools/check.py /tmp/v17_sf5 testdata-local5/sf5 --cache --timeout-sec=3000 \
  --json=CORRECTNESS_r17_sf5.json | tail -4

echo "=== maintain probe: single-level + tiered policy loops + fold-shape A/B ($(date +%H:%M:%S)) ==="
sbt -batch "runMain graft.MaintainProbe MAINTAIN_r17.json /root/testdata/sf0.1 testdata-local/sf1" 2>&1 \
  | grep -E '\[maintain\]' || true

bench() { # <sfdir> <tag>
  echo "=== bench $2 ($(date +%H:%M:%S)) ==="
  find "$1" -type f -exec cat {} + >/dev/null 2>&1 || true
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | sed 's/^\[info\] //' > "BENCH_r17_$2.json"
  cp BENCH_DETAIL.json "BENCH_r17_${2}_detail.json"
  head -c 200 "BENCH_r17_$2.json"; echo
}
bench /root/testdata/sf0.1 sf0.1
bench testdata-local/sf1 sf1
bench testdata-local5/sf5 sf5

echo "=== ann build soak: batched + sharded serve, refresh-trigger loop (5M) ($(date +%H:%M:%S)) ==="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.AnnBuildSoak 5000000 BENCH_r17_annsoak.json" 2>&1 \
  | grep -E '\[annsoak\]|ann_build_soak' | tail -14 || true

echo "=== r17 pipeline DONE ($(date +%H:%M:%S)) ==="
