#!/bin/bash
# r18 end-of-round measurement runner. Unlike r17_final.sh (ADVICE:
# set -uo without -e let a failed sbt run commit an empty artifact),
# every produced artifact is checked non-empty + parseable before the
# script moves on.
set -uo pipefail
REPO=/root/repo
cd "$REPO"

check_json() {  # file must exist, be non-empty, and parse
  python3 - "$1" <<'EOF'
import json, sys
p = sys.argv[1]
with open(p) as f:
    d = json.load(f)
assert d, f"{p} empty"
print(f"[r18final] OK {p}")
EOF
}

bench_tier() {  # <sfdir> <tag>
  local sf=$1 tag=$2
  echo "[r18final] bench $tag $(date +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" >"/tmp/r18_bench_$tag.log" 2>&1
  grep -q '"metric"' "/tmp/r18_bench_$tag.log" || { echo "[r18final] FAIL bench $tag"; exit 1; }
  cp BENCH_HEADLINE.json "BENCH_r18_$tag.json"
  cp BENCH_DETAIL.json "BENCH_r18_${tag}_detail.json"
  check_json "BENCH_r18_$tag.json"
}

bench_tier /root/testdata/sf0.1 sf0.1
bench_tier "$REPO/testdata-local/sf1" sf1
bench_tier "$REPO/testdata-local5/sf5" sf5
echo "[r18final] done $(date +%H:%M:%S)"
