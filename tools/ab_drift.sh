#!/bin/bash
# Interleaved A/B bench at two git refs (r14 VERDICT item 1): settle
# whether the r13 +7-12% all-tier bench slowdown is environment drift
# (both heads equal when measured back-to-back) or a real regression
# (r13 HEAD slower than r12 HEAD in the same session).
#
# Design: A/B/A/B pairs in ONE session on a quiet machine, same warm
# page cache, so slow environment drift cancels out of the pairwise
# delta. Usage: tools/ab_drift.sh [pairs] [sf-dir]
set -euo pipefail
REPO=/root/repo
AB=$REPO/.ab
SF=${2:-$REPO/testdata-local/sf1}
PAIRS=${1:-7}
REF_A=86aebbb   # r12 HEAD
REF_B=72cd8f6   # r13 HEAD

mkdir -p "$AB"
[ -d "$AB/ra" ] || git -C "$REPO" worktree add "$AB/ra" $REF_A
[ -d "$AB/rb" ] || git -C "$REPO" worktree add "$AB/rb" $REF_B

for d in ra rb; do
  echo "[ab] compiling $d ..."
  (cd "$AB/$d" && sbt -batch compile >"/tmp/ab_compile_$d.log" 2>&1)
done

# warm the page cache once for both sides (tables are directories of
# part files on ScaleGen tiers)
find "$SF" -type f -exec cat {} + >/dev/null || true

rm -f /tmp/ab_ra.jsonl /tmp/ab_rb.jsonl
for i in $(seq 1 "$PAIRS"); do
  for d in ra rb; do
    echo "[ab] pair $i side $d $(date +%H:%M:%S)"
    (cd "$AB/$d" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
       sbt -batch "runMain graft.Bench" 2>/dev/null \
       | grep '"metric"' >>"/tmp/ab_$d.jsonl")
    cp "$AB/$d/BENCH_DETAIL.json" "/tmp/ab_detail_${d}_$i.json"
  done
done
echo "[ab] done: /tmp/ab_ra.jsonl /tmp/ab_rb.jsonl + per-pair details"
