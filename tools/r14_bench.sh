#!/bin/bash
# Round-14 tier benches + remaining soaks, sequential on a quiet box.
set -uo pipefail
cd /root/repo

bench() { # <sfdir> <tag>
  echo "=== bench $2 ==="
  find "$1" -type f -exec cat {} + >/dev/null 2>&1 || true
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | sed 's/^\[info\] //' > "BENCH_r14_$2.json"
  cp BENCH_DETAIL.json "BENCH_r14_${2}_detail.json"
  head -c 200 "BENCH_r14_$2.json"; echo
}

bench /root/testdata/sf0.1 sf0.1
bench testdata-local/sf1 sf1
bench testdata-local5/sf5 sf5

echo "=== chaos duel artifact rerun (with catch diagnostics) ==="
sbt -batch "runMain graft.streaming.ChaosDuel 3 9 14 CHAOS_r14.json" 2>&1 \
  | grep -E 'chaos_fence_duel|\[chaos\]' || true

echo "=== ingest soak: second decade (100M rows, 8 GiB cap) ==="
SPARK_GRAFT_INGEST_OUT=BENCH_r14_ingest.json SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.IngestSoak 100000000" 2>&1 | grep ingest_soak || true

echo "=== r14 bench pipeline DONE ==="
