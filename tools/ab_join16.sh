#!/bin/bash
# r16: attribute the join_inner_hash +12% paired row from AB_SF5_r15
# (r15 VERDICT item 2). Single-QUERY paired A/B at sf5: each side runs
# ONE bench invocation restricted to join_inner_hash
# (SPARK_GRAFT_ONLY — selection-only harness patch applied identically
# to the r13 worktree), alternating A/B so each pair's two sides run
# minutes—not a full bench—apart. SPARK_GRAFT_RUNS=5 (max 7) tightens
# the per-invocation median.
#
# Usage: tools/ab_join16.sh [pairs] [queries] [outjson]
set -uo pipefail
REPO=/root/repo
SF=$REPO/testdata-local5/sf5
PAIRS=${1:-6}
Q=${2:-join_inner_hash}
OUT=${3:-AB_JOIN16.json}

find "$SF" -type f -exec cat {} + >/dev/null 2>&1 || true

TAG=$(echo "$Q" | tr ',' '_' | cut -c1-40)
rm -f "/tmp/abj_${TAG}_a.jsonl" "/tmp/abj_${TAG}_b.jsonl"
for i in $(seq 1 "$PAIRS"); do
  for d in ja jb; do
    sfx=a; [ "$d" = jb ] && sfx=b
    echo "[abj] pair $i side $d $(date +%H:%M:%S)"
    (cd "$REPO/.ab5/$d" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
       SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_RUNS=5 \
       sbt -batch "runMain graft.Bench" 2>/dev/null \
       | grep '"metric"' >>"/tmp/abj_${TAG}_$sfx.jsonl")
  done
done
python3 "$REPO/tools/ab_analyze.py" "/tmp/abj_${TAG}_a.jsonl" \
  "/tmp/abj_${TAG}_b.jsonl" "$REPO/$OUT" \
  "single-query interleaved A/B at sf5 ($Q, SPARK_GRAFT_ONLY harness patch on both sides), one invocation per side per pair, warm cache, r13 HEAD (72cd8f6) vs r16 HEAD"
