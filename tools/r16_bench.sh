#!/bin/bash
# Round-16 artifact pipeline, sequential on a quiet box:
#  1. one-time FULL 164-query sf5 correctness sweep at HEAD
#     (r15 VERDICT item 4 — retire the three-round stitch)
#  2. MAINTAIN_r16: single-level vs TIERED policy loops at sf0.1+sf1
#  3. tier benches sf0.1 / sf1 / sf5
#  4. ann build soak: batched-serve kernels A/B + maintained-session
#     refresh cost at 5M vectors
set -uo pipefail
cd /root/repo

echo "=== sf5 full 164-query sweep ($(date +%H:%M:%S)) ==="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify testdata-local5/sf5 /tmp/v16_sf5" 2>&1 \
  | grep -E '\[verify\].*failed' || true
python3 tools/check.py /tmp/v16_sf5 testdata-local5/sf5 --cache --timeout-sec=3000 \
  --json=CORRECTNESS_r16_sf5.json | tail -4

echo "=== maintain probe: single-level + tiered policy loops ($(date +%H:%M:%S)) ==="
sbt -batch "runMain graft.MaintainProbe MAINTAIN_r16.json /root/testdata/sf0.1 testdata-local/sf1" 2>&1 \
  | grep -E '\[maintain\]' || true

bench() { # <sfdir> <tag>
  echo "=== bench $2 ($(date +%H:%M:%S)) ==="
  find "$1" -type f -exec cat {} + >/dev/null 2>&1 || true
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | sed 's/^\[info\] //' > "BENCH_r16_$2.json"
  cp BENCH_DETAIL.json "BENCH_r16_${2}_detail.json"
  head -c 200 "BENCH_r16_$2.json"; echo
}
bench /root/testdata/sf0.1 sf0.1
bench testdata-local/sf1 sf1
bench testdata-local5/sf5 sf5

echo "=== ann build soak: batched kernels + session refresh (5M) ($(date +%H:%M:%S)) ==="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.AnnBuildSoak 5000000 BENCH_r16_annsoak.json" 2>&1 \
  | grep -E '\[annsoak\]|ann_build_soak' | tail -12 || true

echo "=== r16 pipeline DONE ($(date +%H:%M:%S)) ==="
