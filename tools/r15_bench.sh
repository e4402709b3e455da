#!/bin/bash
# Round-15 tier benches + soaks + chaos, sequential on a quiet box.
set -uo pipefail
cd /root/repo

bench() { # <sfdir> <tag>
  echo "=== bench $2 ($(date +%H:%M:%S)) ==="
  find "$1" -type f -exec cat {} + >/dev/null 2>&1 || true
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | sed 's/^\[info\] //' > "BENCH_r15_$2.json"
  cp BENCH_DETAIL.json "BENCH_r15_${2}_detail.json"
  head -c 200 "BENCH_r15_$2.json"; echo
}

bench /root/testdata/sf0.1 sf0.1
bench testdata-local/sf1 sf1
bench testdata-local5/sf5 sf5

echo "=== maintain probe with the policy loop ($(date +%H:%M:%S)) ==="
sbt -batch "runMain graft.MaintainProbe MAINTAIN_r15.json /root/testdata/sf0.1 testdata-local/sf1" 2>&1 \
  | grep -E '\[maintain\]' || true

echo "=== chaos soak: 5 writers x 50 rounds x 3 seeds ($(date +%H:%M:%S)) ==="
for seed in 15 16 17; do
  sbt -batch "runMain graft.streaming.ChaosDuel 5 50 $seed /tmp/chaos_r15_seed$seed.json 6 3" 2>&1 \
    | grep -E 'chaos_fence_duel|\[chaos\]' | tail -20 || true
done
python3 tools/chaos_merge.py CHAOS_r15.json /tmp/chaos_r15_seed15.json /tmp/chaos_r15_seed16.json /tmp/chaos_r15_seed17.json || true

echo "=== ann build soak with serve_batched (5M vectors) ($(date +%H:%M:%S)) ==="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.AnnBuildSoak 5000000 BENCH_r15_annsoak.json" 2>&1 \
  | grep -E '\[annsoak\]|ann_build_soak' | tail -10 || true

echo "=== r15 bench pipeline DONE ($(date +%H:%M:%S)) ==="
